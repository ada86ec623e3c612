"""Parquet-footer table statistics for the engine-side join-order pass.

Why this exists: the reference delegates queries to engines with a
cost-based optimizer and catalog statistics (DuckDB / Trino both
cost-reorder joins).  Spark's CBO join reordering requires ANALYZE'd
catalog rowCount/column stats, which path-registered parquet temp views
never have — Catalyst keeps multi-way inner joins in *written* order,
and at sf100 that makes TPC-H Q5 join two facts before the selective
region dimension (measured 16x slower than DuckDB).  Parquet footers
already carry exactly the statistics a greedy reorder needs — row
counts and per-column min/max — at the cost of one metadata read per
file, no data scan.

At 100 TB the footprint stays bounded: stats come from at most
``MAX_FOOTER_FILES`` file footers per table (row counts extrapolated by
byte share for the rest), results are cached per (path, mtime), and
only the columns the optimizer asks about are aggregated.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

MAX_FOOTER_FILES = 32


@dataclass
class ColStats:
    min_v: object = None
    max_v: object = None
    nulls: int = 0
    logical: str = ""        # pyarrow logical type string ("int64", "date32[day]", ...)
    exact: bool = True       # False when min/max missing for some row group


@dataclass
class TableStats:
    rows: int
    bytes: int
    cols: dict[str, ColStats] = field(default_factory=dict)
    sampled: bool = False    # True when rows were extrapolated from a file sample

    def ndv(self, col: str) -> int | None:
        """Distinct-count estimate for ``col``.

        Integral-like columns (ints, dates, timestamps) get the dense-key
        span estimate min(rows, max-min+1) — exact for synthetic and
        surrogate keys, an upper bound otherwise (upper bounds are the
        safe direction for join-size estimation: they can only make a
        join look bigger, never hide a blow-up).  Other types return
        None; callers fall back to the classic rows-as-key assumption.
        """
        cs = self.cols.get(col)
        if cs is None or cs.min_v is None or cs.max_v is None:
            return None
        span = _span(cs.min_v, cs.max_v, cs.logical)
        if span is None:
            return None
        return max(1, min(self.rows, span))

    def null_fraction(self, col: str) -> float:
        cs = self.cols.get(col)
        if cs is None or self.rows <= 0:
            return 0.0
        return min(1.0, cs.nulls / self.rows)


def _span(lo, hi, logical: str) -> int | None:
    import datetime

    if isinstance(lo, bool) or isinstance(hi, bool):
        return 2
    if isinstance(lo, int) and isinstance(hi, int):
        return hi - lo + 1
    if isinstance(lo, datetime.datetime) and isinstance(hi, datetime.datetime):
        # day granularity: event-time columns are continuous, treating
        # every microsecond as a distinct value would void the estimate
        return (hi - lo).days + 1
    if isinstance(lo, datetime.date) and isinstance(hi, datetime.date):
        return (hi - lo).days + 1
    return None


def _to_comparable(v, logical: str):
    """Normalize a stats value / literal to a number for range math."""
    import datetime

    if isinstance(v, bool):
        return int(v)
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, datetime.datetime):
        return float(v.toordinal()) + v.hour / 24.0
    if isinstance(v, datetime.date):
        return float(v.toordinal())
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return None


_FOOTER_CACHE: dict[tuple, TableStats] = {}


def parquet_table_stats(files: list[str]) -> TableStats | None:
    """Aggregate footer statistics over parquet files (no data scan).

    Reads at most MAX_FOOTER_FILES footers; when a table has more files,
    total rows are extrapolated by byte share and per-column min/max come
    from the sampled footers only (still valid bounds for uniformly
    written data; ``sampled`` marks the result).
    """
    import pyarrow.parquet as pq

    files = [f[len("file:"):] if f.startswith("file:") else f for f in files]
    files = sorted(files)
    if not files:
        return None
    key_parts = []
    total_bytes = 0
    for f in files:
        try:
            st = os.stat(f)
        except OSError:
            return None
        key_parts.append((f, st.st_mtime_ns, st.st_size))
        total_bytes += st.st_size
    key = tuple(key_parts)
    hit = _FOOTER_CACHE.get(key)
    if hit is not None:
        return hit

    sampled = len(files) > MAX_FOOTER_FILES
    read_files = files[:MAX_FOOTER_FILES]
    read_bytes = sum(s for (f, _m, s) in key_parts[:MAX_FOOTER_FILES])

    rows = 0
    cols: dict[str, ColStats] = {}
    try:
        for f in read_files:
            md = pq.ParquetFile(f).metadata
            rows += md.num_rows
            schema = md.schema
            names = [schema.column(i).path for i in range(md.num_columns)]
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(md.num_columns):
                    name = names[ci]
                    if "." in name:        # nested field — not a join/filter column
                        continue
                    col = g.column(ci)
                    cs = cols.setdefault(
                        name, ColStats(logical=str(schema.column(ci).logical_type)))
                    stats = col.statistics
                    if stats is None or not stats.has_min_max:
                        cs.exact = False
                        cs.min_v = cs.min_v if cs.min_v is not None else None
                        continue
                    if stats.null_count is not None:
                        cs.nulls += stats.null_count
                    mn, mx = stats.min, stats.max
                    if cs.min_v is None or (mn is not None and _lt(mn, cs.min_v)):
                        cs.min_v = mn
                    if cs.max_v is None or (mx is not None and _lt(cs.max_v, mx)):
                        cs.max_v = mx
    except Exception:
        return None
    if sampled and read_bytes > 0:
        rows = int(rows * (total_bytes / read_bytes))
    out = TableStats(rows=max(rows, 1), bytes=total_bytes, cols=cols,
                     sampled=sampled)
    if len(_FOOTER_CACHE) > 256:
        _FOOTER_CACHE.clear()
    _FOOTER_CACHE[key] = out
    return out


def _lt(a, b) -> bool:
    try:
        return a < b
    except TypeError:
        return False
