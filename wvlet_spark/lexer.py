"""Tokenizer for the wvlet language.

A fresh regex-driven scanner (the reference uses a hand-written Scala
scanner, wvlet-lang compiler/parser/Scanner.scala; behavior-equivalent
token classes, new implementation).
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class WvletSyntaxError(Exception):
    def __init__(self, msg: str, line: int = -1, col: int = -1):
        super().__init__(f"{msg} (line {line}, col {col})" if line >= 0 else msg)
        self.line = line
        self.col = col


@dataclass
class Token:
    kind: str      # IDENT BQIDENT STRING TSTRING INT FLOAT DECIMAL OP EOF SQL_STRING INTERP_STRING
    text: str
    line: int
    col: int

    def __repr__(self):  # pragma: no cover
        return f"Token({self.kind},{self.text!r})"


# Multi-char operators first (longest match wins)
_OPERATORS = [
    "<=>", "::", "<=", ">=", "!=", "<>", "==", "->", "//", "||",
    "=", "<", ">", "+", "-", "*", "/", "%", "(", ")", "[", "]", "{", "}",
    ",", ";", ":", ".", "?", "$", "@", "!", "#", "|",
]

_OP_RE = re.compile("|".join(re.escape(op) for op in _OPERATORS))

_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_NUM_RE = re.compile(
    r"""
    (?P<float>(?:\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)[fF]?|\d+[fF])
  | (?P<int>\d+)
    """,
    re.VERBOSE,
)
_WS_RE = re.compile(r"[ \t\r\n]+")
_LINE_COMMENT_RE = re.compile(r"--[^\n]*")
_DOC_COMMENT_RE = re.compile(r"---.*?---", re.DOTALL)
_DURATION_RE = re.compile(r"\d+(?:\.\d+)?(ms|s|m|h|d|w)\b")


def tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    pos = 0
    n = len(text)
    line = 1
    line_start = 0

    def cur_col(p: int) -> int:
        return p - line_start + 1

    def advance_lines(s: str, start: int):
        nonlocal line, line_start
        idx = start
        for m in re.finditer(r"\n", s):
            line += 1
            line_start = idx + m.end()

    while pos < n:
        ch = text[pos]

        m = _WS_RE.match(text, pos)
        if m:
            advance_lines(m.group(0), pos)
            pos = m.end()
            continue

        m = _DOC_COMMENT_RE.match(text, pos)
        if m:
            advance_lines(m.group(0), pos)
            pos = m.end()
            continue

        m = _LINE_COMMENT_RE.match(text, pos)
        if m:
            pos = m.end()
            continue

        # /* ... */ (and /** ... */) block comments
        if text.startswith("/*", pos):
            endc = text.find("*/", pos + 2)
            if endc < 0:
                raise WvletSyntaxError("unterminated block comment", line, cur_col(pos))
            advance_lines(text[pos : endc + 2], pos)
            pos = endc + 2
            continue

        # s`...${expr}...` — interpolated identifier (table/result names;
        # reference: spec/basic/backquote-interpolation.wv)
        if text.startswith("s`", pos):
            endq = text.find("`", pos + 2)
            if endq < 0:
                raise WvletSyntaxError("unterminated interpolated identifier",
                                      line, cur_col(pos))
            tokens.append(Token("INTERP_BQIDENT", text[pos + 2 : endq], line, cur_col(pos)))
            pos = endq + 1
            continue

        # string prefixes: s"...", sql"..." (each also with """ bodies)
        if text.startswith('s"', pos) or text.startswith("sql\"", pos):
            prefix = "sql" if text.startswith("sql\"", pos) else "s"
            kind = "SQL_STRING" if prefix == "sql" else "INTERP_STRING"
            start = pos + len(prefix)
            if text.startswith('"""', start):
                body, end = _scan_triple(text, start, line, cur_col(pos))
            else:
                body, end = _scan_quoted(text, start, '"', line, cur_col(pos))
            tokens.append(Token(kind, body, line, cur_col(pos)))
            advance_lines(text[pos:end], pos)
            pos = end
            continue

        if text.startswith('"""', pos):
            body, end = _scan_triple(text, pos, line, cur_col(pos))
            tokens.append(Token("TSTRING", body, line, cur_col(pos)))
            advance_lines(text[pos:end], pos)
            pos = end
            continue

        if ch == '"' or ch == "'":
            body, end = _scan_quoted(text, pos, ch, line, cur_col(pos))
            # single-quoted and double-quoted are both string literals in wvlet
            tokens.append(Token("STRING", body, line, cur_col(pos)))
            advance_lines(text[pos:end], pos)
            pos = end
            continue

        if ch == "`":
            endq = text.find("`", pos + 1)
            if endq < 0:
                raise WvletSyntaxError("unterminated backquoted identifier", line, cur_col(pos))
            tokens.append(Token("BQIDENT", text[pos + 1 : endq], line, cur_col(pos)))
            pos = endq + 1
            continue

        if ch.isdigit():
            # duration literal 5m / 30s / 100ms / 2h / 1d (flow DSL)
            m = _DURATION_RE.match(text, pos)
            if m:
                tokens.append(Token("DURATION", m.group(0), line, cur_col(pos)))
                pos = m.end()
                continue
            m = _NUM_RE.match(text, pos)
            if m.group("float"):
                tokens.append(Token("FLOAT", m.group(0), line, cur_col(pos)))
            else:
                tokens.append(Token("INT", m.group(0), line, cur_col(pos)))
            pos = m.end()
            continue

        m = _IDENT_RE.match(text, pos)
        if m:
            tokens.append(Token("IDENT", m.group(0), line, cur_col(pos)))
            pos = m.end()
            continue

        m = _OP_RE.match(text, pos)
        if m:
            tokens.append(Token("OP", m.group(0), line, cur_col(pos)))
            pos = m.end()
            continue

        raise WvletSyntaxError(f"unexpected character {ch!r}", line, cur_col(pos))

    tokens.append(Token("EOF", "", line, cur_col(pos)))
    return tokens


def _scan_triple(text: str, start: int, line: int, col: int) -> tuple[str, int]:
    """Scan a triple-quoted string starting at `start` (the first quote).
    The closing delimiter is greedy: `\"\"\"select 1 as "id"\"\"\"` keeps the
    embedded trailing quote in the body (reference: spec/basic/triple-quote.wv)."""
    endq = text.find('"""', start + 3)
    if endq < 0:
        raise WvletSyntaxError("unterminated triple-quote string", line, col)
    n = len(text)
    while endq + 3 < n and text[endq + 3] == '"':
        endq += 1
    return text[start + 3 : endq], endq + 3


def _scan_quoted(text: str, start: int, quote: str, line: int, col: int) -> tuple[str, int]:
    """Scan a quoted string starting at `start` (the opening quote).
    Returns (body, end_pos_after_closing_quote). Supports backslash escapes
    and doubled quotes."""
    out = []
    i = start + 1
    n = len(text)
    while i < n:
        c = text[i]
        if c == "\\" and i + 1 < n:
            nxt = text[i + 1]
            mapping = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", '"': '"', "'": "'"}
            out.append(mapping.get(nxt, "\\" + nxt))
            i += 2
            continue
        if c == quote:
            if i + 1 < n and text[i + 1] == quote:
                out.append(quote)
                i += 2
                continue
            return "".join(out), i + 1
        out.append(c)
        i += 1
    raise WvletSyntaxError("unterminated string literal", line, col)
