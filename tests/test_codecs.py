"""Pure-Python codec tests: PNG (zlib inflate + all five scanline filters)
and WAV (RIFF walk + PCM16)."""

import struct
import zlib

import numpy as np
import pytest

from wvlet_spark.ops.codecs import (
    PNG_SIG, png_decode, png_encode, wav_decode, wav_encode,
)


def test_png_roundtrip_grey():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = png_encode(img)
    assert data.startswith(PNG_SIG)
    px, meta = png_decode(data)
    assert meta == {"width": 8, "height": 8, "channels": 1, "bit_depth": 8}
    assert np.array_equal(px[:, :, 0], img)


def test_png_roundtrip_rgb_and_rgba():
    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, (5, 11, 3), dtype=np.uint8)
    px, meta = png_decode(png_encode(rgb))
    assert (meta["width"], meta["height"], meta["channels"]) == (11, 5, 3)
    assert np.array_equal(px, rgb)
    rgba = rng.randint(0, 256, (3, 4, 4), dtype=np.uint8)
    px, meta = png_decode(png_encode(rgba))
    assert meta["channels"] == 4 and np.array_equal(px, rgba)


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Hand-build a PNG using specific per-row filter types (encoder always
    writes filter 0; the decoder must reconstruct all of them)."""
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)

    def chunk(tag, data):
        return struct.pack(">I", len(data)) + tag + data + \
            struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    raw = bytearray()
    prev = bytearray(w)
    for y in range(h):
        f = filters[y % len(filters)]
        line = bytearray(int(v) for v in img[y])
        enc = bytearray(w)
        for i in range(w):
            a = line[i - 1] if i >= 1 else 0
            b = prev[i]
            c = prev[i - 1] if i >= 1 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[i] = (line[i] - pred) & 0xFF
        raw.append(f)
        raw.extend(enc)
        prev = line
    return PNG_SIG + chunk(b"IHDR", ihdr) + \
        chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


def test_png_decode_all_filter_types():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (10, 7), dtype=np.uint8)
    data = _png_with_filters(img, [0, 1, 2, 3, 4])
    px, meta = png_decode(data)
    assert np.array_equal(px[:, :, 0], img)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")


def test_wav_roundtrip_mono_and_stereo():
    mono = (np.sin(np.linspace(0, 20, 400)) * 20000).astype(np.int16)
    a, meta = wav_decode(wav_encode(mono, 8000))
    assert meta == {"channels": 1, "sample_rate": 8000, "n_samples": 400, "bit_depth": 16}
    assert np.array_equal(a[:, 0], mono)
    stereo = np.stack([mono, -mono], axis=1)
    a, meta = wav_decode(wav_encode(stereo, 44100))
    assert meta["channels"] == 2 and meta["sample_rate"] == 44100
    assert np.array_equal(a, stereo)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        wav_decode(b"RIFFxxxxJUNK")
