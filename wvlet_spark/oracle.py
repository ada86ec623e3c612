"""Oracle cross-check utilities: run a suite entry on Spark (via the engine)
and on DuckDB (via hand-written SQL), normalize, and compare — the same
shape of check the driver's CORRECTNESS gate performs."""

from __future__ import annotations

import datetime
import decimal
import math
import os


def duckdb_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for fn in sorted(os.listdir(sf_dir)):
        if fn.endswith(".parquet"):
            t = fn[: -len(".parquet")]
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, fn)}'")
    return con


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", f"{v:.10g}")
    if isinstance(v, datetime.datetime):
        return ("ts", v.isoformat(sep=" "))
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def normalize_rows(columns: list[str], rows) -> list[tuple]:
    """Sort columns by name, normalize values, sort rows — order-insensitive
    comparable form."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(_norm(vals[i]) for i in order))
    out.sort(key=repr)
    return out


def _numeric_kind_mismatch(s_cols, s_rows, con, oracle_sql: str) -> list[str]:
    """Detect the pandas *dtype* skews the external driver's canonicalizer is
    sensitive to even when every value matches (round-5 postmortem:
    ext_profile_numeric — DuckDB HUGEINT sum widened to float64 against
    Spark's int64, so int 0 vs float 0.0 hash-mismatched).

    Both sides are materialized the way the driver sees them — the Spark rows
    already collected (pandas inference matches toPandas on the int-vs-float
    axis: non-null longs -> int64, nullable longs -> float64) and the oracle
    via fetchdf().  Only the numeric int-vs-float axis is compared; object /
    datetime representation quirks (dates, decimals) differ benignly between
    from-records and fetchdf and are not driver-visible the same way.
    """
    import pandas as pd

    spd = pd.DataFrame(s_rows, columns=s_cols)
    opd = con.execute(oracle_sql).fetchdf()
    bad = []
    for c in spd.columns:
        if c not in opd.columns:
            continue
        sk = spd[c].dtype.kind
        ok = opd[c].dtype.kind
        sk = "i" if sk == "u" else sk
        ok = "i" if ok == "u" else ok
        if sk != ok and {sk, ok} <= {"i", "f"}:
            bad.append(f"{c}: spark pandas dtype kind={sk!r} vs oracle {ok!r}"
                       " (int-vs-float skew — driver hash is dtype-sensitive;"
                       " CAST the oracle aggregate or align the Spark type)")
    return bad


def compare(spark_df, con, oracle_sql: str, check_dtypes: bool = True) -> tuple[bool, str]:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    cur = con.execute(oracle_sql)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    if sorted(s_cols) != sorted(o_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    sn = normalize_rows(s_cols, s_rows)
    on = normalize_rows(o_cols, o_rows)
    if sn != on:
        diffs = [i for i, (a, b) in enumerate(zip(sn, on)) if a != b][:3]
        msg = "; ".join(f"row{i}: spark={sn[i]} oracle={on[i]}" for i in diffs)
        return False, f"value mismatch: {msg}"
    if check_dtypes:
        bad = _numeric_kind_mismatch(s_cols, s_rows, con, oracle_sql)
        if bad:
            return False, "dtype mismatch: " + "; ".join(bad)
    return True, "ok"
