"""Interactive query selection — run a pipeline truncated at a cursor
line (the reference's editor/REPL UX: QuerySelector.scala selects the
statement / smallest subquery containing the cursor and runs a preview).

Selection modes (mirroring QuerySelection):
- "all":        the whole source, unchanged
- "single":     only the statement containing the target line
- "all_before": every statement up to and including the containing one
- "subquery":   preceding statements + the containing statement CUT AT
                THE TARGET LINE — the mid-pipeline preview.  Open
                braces/brackets are closed and, if the cut line is
                syntactically partial, lines are dropped until the prefix
                parses.
- "describe":   like "subquery" with a trailing `describe` pipe — schema
                preview instead of rows.

Text-level truncation (rather than span-walking the AST) is what an
editor integration actually wants: it works on sources that do not fully
parse below the cursor — the main reason to preview mid-pipeline.
"""

from __future__ import annotations

from wvlet_spark.lexer import WvletSyntaxError

_OPEN = {"(": ")", "[": "]", "{": "}"}
_CLOSE = {")", "]", "}"}


def _closers_for(text: str) -> str | None:
    """Closers needed to balance `text`, or None if it cannot be lexed
    (e.g. the cut fell inside a string literal)."""
    from wvlet_spark.lexer import tokenize

    try:
        tokens = tokenize(text)
    except WvletSyntaxError:
        return None
    stack: list[str] = []
    for t in tokens:
        if t.kind == "OP":
            if t.text in _OPEN:
                stack.append(_OPEN[t.text])
            elif t.text in _CLOSE:
                if stack and stack[-1] == t.text:
                    stack.pop()
    return "".join(reversed(stack))


def _parses(text: str) -> bool:
    from wvlet_spark.parser import Parser

    try:
        Parser(text).parse_statements()
        return True
    except WvletSyntaxError:
        return False


def _truncate_statement(stmt_lines: list[str], upto: int) -> str | None:
    """Longest prefix of `stmt_lines[:upto]` that balances and parses
    (joined with the closers it needed), or None."""
    for end in range(upto, 0, -1):
        prefix = "\n".join(stmt_lines[:end]).rstrip()
        if not prefix.strip():
            return None
        closers = _closers_for(prefix)
        if closers is None:
            continue
        candidate = prefix + ("\n" + " ".join(closers) if closers else "")
        if _parses(candidate):
            return candidate
    return None


def select_text(text: str, line: int | None = None,
                mode: str = "subquery") -> str:
    """Selected source text per `mode` / cursor `line` (1-indexed)."""
    if mode == "all":
        return text
    from wvlet_spark.parser import Parser

    lines = text.split("\n")
    if line is None:
        line = len(lines)
    line = max(1, min(line, len(lines)))
    try:
        stmts = Parser(text).parse_statements()
    except WvletSyntaxError:
        # the document below/around the cursor doesn't parse — the main
        # reason to preview.  Treat the whole text as one statement and
        # let prefix truncation find the longest valid cut.
        stmts = []
    if not stmts:
        class _Span:  # minimal stand-in carrying the line span
            line_start = 1
            line_end = len(lines)
        stmts = [_Span()]
    target = None
    for s in stmts:
        if getattr(s, "line_start", 1) <= line:
            target = s
        if getattr(s, "line_end", len(lines)) >= line:
            break
    if target is None:
        target = stmts[0]
    ls = getattr(target, "line_start", 1)
    le = getattr(target, "line_end", len(lines))

    if mode == "single":
        return "\n".join(lines[ls - 1:le])
    if mode == "all_before":
        return "\n".join(lines[:le])
    if mode in ("subquery", "describe"):
        before = "\n".join(lines[:ls - 1])
        upto = min(line, le) - (ls - 1)
        cut = _truncate_statement(lines[ls - 1:le], max(1, upto))
        if cut is None:
            cut = "\n".join(lines[ls - 1:le])
        if mode == "describe":
            cut += "\ndescribe"
        return (before + "\n" + cut) if before.strip() else cut
    raise ValueError(f"unknown selection mode: {mode!r}")
