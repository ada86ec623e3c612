"""Pure-Python media codecs — stdlib (zlib/struct) + numpy only.

Real decoders, not header peeks: PNG IDAT streams are inflated and the
scanline filters (None/Sub/Up/Average/Paeth) reconstructed to pixels; WAV
RIFF chunks are walked and PCM16 frames decoded to sample arrays.  Scope:
PNG 8-bit greyscale/greyscale+alpha/RGB/RGBA non-interlaced; WAV PCM16.

These run inside Arrow-batched UDFs (wvlet_spark/ops/multimodal.py); the
container has no image/audio libraries, so this is the in-repo decode path
for the multimodal operators.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CTYPE_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def png_encode(pixels) -> bytes:
    """Encode a uint8 array as PNG: (h,w) grey, (h,w,3) RGB, (h,w,4) RGBA."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(a.shape[2])
    if ctype is None:
        raise ValueError(f"unsupported channel count {a.shape[2]}")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))  # filter 0 rows
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b""))


def png_decode(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a PNG to ((h, w, channels) uint8, metadata dict).  Inflates
    IDAT and reconstructs all five scanline filters."""
    if not data or not data.startswith(PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = len(PNG_SIG), None, b""
    while pos + 8 <= len(data):
        ln, tag = struct.unpack(">I4s", data[pos:pos + 8])
        pos += 8
        chunk = data[pos:pos + ln]
        pos += ln + 4  # payload + CRC
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif tag == b"IDAT":
            idat += chunk
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or ctype not in _CTYPE_CHANNELS:
        raise ValueError(f"unsupported PNG variant depth={depth} ctype={ctype}")
    channels = _CTYPE_CHANNELS[ctype]
    stride, bpp = w * channels, channels
    raw = zlib.decompress(idat)
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = bytearray(stride)
    p = 0
    for y in range(h):
        f = raw[p]
        row = bytearray(raw[p + 1:p + 1 + stride])
        p += 1 + stride
        if f == 1:    # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
        prev = row
    meta = {"width": w, "height": h, "channels": channels, "bit_depth": depth}
    return out.reshape(h, w, channels), meta


def wav_encode(samples, sample_rate: int = 16000) -> bytes:
    """Encode int16 samples ((n,) mono or (n, ch)) as a PCM16 WAV."""
    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a PCM16 WAV to ((n_frames, channels) int16, metadata dict)."""
    if not data or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        ln = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        pos += 8
        chunk = data[pos:pos + ln]
        pos += ln + (ln & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif tag == b"data":
            pcm = chunk
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, rate, _br, _ba, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported WAV: fmt={audio_fmt} bits={bits}")
    a = np.frombuffer(pcm[:len(pcm) - len(pcm) % (2 * ch)], dtype="<i2").reshape(-1, ch)
    meta = {"channels": ch, "sample_rate": rate, "n_samples": a.shape[0], "bit_depth": bits}
    return a, meta
