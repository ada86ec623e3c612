"""Unicode box rendering of query results (reference: QueryResultPrinter's
pretty-box format used by `test _.output should be` golden assertions —
spec/basic/select-json.wv, double_func.wv, map.wv, agg_tpe_resolve.wv).

Format rules (derived from the reference's golden outputs):
- header and type rows are centered in the column width
- numeric cells right-align; strings and composites left-align
- `bigint`->`long`, `varchar`->`string`, angle brackets -> parens
  (`map<string,int>` -> `map(string,int)`)
- map values render `{k=v, ...}`; the footer row spans all columns
"""

from __future__ import annotations

import decimal
import re


def _type_name(dt) -> str:
    s = dt.simpleString()
    s = s.replace("<", "(").replace(">", ")")
    s = re.sub(r"\bbigint\b", "long", s)
    s = re.sub(r"\bvarchar\b", "string", s)
    return s


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
        # plain notation at the value's own scale: decimal(38,2) 380456.00
        # keeps its trailing zeros (DuckDB/reference display parity)
        return f"{v:f}"
    if isinstance(v, list):
        return "[" + ", ".join(_fmt(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{k}={_fmt(x)}" for k, x in v.items()) + "}"
    return str(v)


_NUMERIC = (int, float, decimal.Decimal)


def render_box(columns: list[str], rows: list[list], schema=None) -> str:
    types = [""] * len(columns)
    if schema is not None:
        types = [_type_name(f.dataType) for f in schema.fields]
    cells = [[_fmt(v) for v in row] for row in rows]
    # a column is right-aligned iff every non-null value is numeric (not bool)
    numeric = []
    for i in range(len(columns)):
        vals = [row[i] for row in rows if row[i] is not None]
        numeric.append(bool(vals) and all(
            isinstance(v, _NUMERIC) and not isinstance(v, bool) for v in vals))
    widths = []
    for i, c in enumerate(columns):
        w = max(
            [len(c), len(types[i])] + [len(r[i]) for r in cells] if cells else [len(c), len(types[i])]
        )
        widths.append(w)

    def line(l, m, r):
        return l + m.join("─" * (w + 2) for w in widths) + r

    def row_text(vals, align):
        parts = []
        for j, (v, w) in enumerate(zip(vals, widths)):
            if align == "center":
                # reference centers with the extra space on the RIGHT
                # (Python's str.center biases the other way for odd pads)
                pad = w - len(v)
                parts.append(" " * (pad // 2) + v + " " * (pad - pad // 2))
            elif align == "auto" and numeric[j]:
                parts.append(v.rjust(w))
            else:
                parts.append(v.ljust(w))
        return "│ " + " │ ".join(parts) + " │"

    out = [line("┌", "┬", "┐"), row_text(columns, "center"),
           row_text(types, "center"), line("├", "┼", "┤")]
    for r in cells:
        out.append(row_text(r, "auto"))
    footer = f"{len(rows)} rows"
    total_w = sum(w + 3 for w in widths) - 1
    out.append(line("├", "┴", "┤"))
    out.append("│ " + footer.ljust(total_w - 2) + " │")
    out.append(line("└", "─", "┘"))
    return "\n".join(out)
