"""Unicode box rendering of query results (reference: QueryResultPrinter's
pretty-box format used by `test _.output should be` golden assertions)."""

from __future__ import annotations

import decimal


def _type_name(dt) -> str:
    s = dt.simpleString()
    return {"bigint": "long", "varchar": "string"}.get(s, s)


def _fmt(v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return str(v)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize() if v == v.to_integral_value() else v)
    if isinstance(v, list):
        return "[" + ", ".join(_fmt(x) for x in v) + "]"
    return str(v)


def render_box(columns: list[str], rows: list[list], schema=None) -> str:
    types = [""] * len(columns)
    if schema is not None:
        types = [_type_name(f.dataType) for f in schema.fields]
    cells = [[_fmt(v) for v in row] for row in rows]
    widths = []
    for i, c in enumerate(columns):
        w = max(
            [len(c), len(types[i])] + [len(r[i]) for r in cells] if cells else [len(c), len(types[i])]
        )
        widths.append(w)

    def line(l, m, r):
        return l + m.join("─" * (w + 2) for w in widths) + r

    def row_text(vals):
        return "│ " + " │ ".join(v.ljust(w) for v, w in zip(vals, widths)) + " │"

    out = [line("┌", "┬", "┐"), row_text(columns), row_text(types), line("├", "┼", "┤")]
    for r in cells:
        out.append(row_text(r))
    footer = f"{len(rows)} rows"
    total_w = sum(w + 3 for w in widths) - 1
    out.append(line("├", "┴", "┤"))
    out.append("│ " + footer.ljust(total_w - 2) + " │")
    out.append(line("└", "─", "┘"))
    return "\n".join(out)
