"""Transactional-table capability layer (Delta Lake / Apache Iceberg).

The reference exercises Delta through its Trino plugin
(reference: spec/delta/, wvlet-runner Trino connector); Spark reaches the
same storage through the delta-spark / iceberg-spark runtimes, which are
absent from this sandbox's frozen dependencies.  So the engine probes the
TARGET's catalog provider at run time:

- provider in {delta, iceberg}  -> emit real `DELETE FROM ... WHERE` /
  `MERGE INTO` SQL (transactional, no table rewrite);
- anything else (parquet temp views, this sandbox) -> the documented
  fallback paths (anti-filter rewrite in session._run_delete, atomic
  parquet swap in streaming.windowed_agg_stream).

SQL generation is deterministic and unit-tested both ways without the
runtimes (tests/test_ops.py::test_acid_*) — on a cluster with a Delta or
Iceberg catalog the capable branch lights up with no code change.
"""

from __future__ import annotations

ACID_PROVIDERS = frozenset({"delta", "iceberg"})


def table_provider(spark, table: str) -> str | None:
    """The catalog provider of `table` (lower-cased), or None when the
    table is a temp view / unknown.  Uses DESCRIBE TABLE EXTENDED's
    `Provider` row — present for all V1/V2 catalog tables."""
    try:
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
            if (r[0] or "").strip().lower() == "provider":
                return (r[1] or "").strip().lower()
    except Exception:
        return None
    return None


def supports_sql_delete(spark, table: str) -> bool:
    """True when the target accepts `DELETE FROM ... WHERE` natively."""
    return table_provider(spark, table) in ACID_PROVIDERS


def supports_merge(spark, table: str) -> bool:
    """True when the target accepts `MERGE INTO` natively."""
    return table_provider(spark, table) in ACID_PROVIDERS


def delete_sql(table: str, cond_sql: str | None) -> str:
    """`DELETE FROM <table> WHERE <cond>` (everything when cond is None —
    wvlet `delete` on an unfiltered pipe)."""
    return f"DELETE FROM {table} WHERE {cond_sql or 'TRUE'}"


def merge_upsert_sql(table: str, source: str, keys: list[str]) -> str:
    """Upsert-by-key MERGE: match on `keys`, update every column on
    match, insert otherwise — the transactional form of the
    read/anti-join/union/swap fallback in streaming.windowed_agg_stream
    (both bodies implement the same upsert contract)."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    return (f"MERGE INTO {table} t USING {source} s ON {on} "
            f"WHEN MATCHED THEN UPDATE SET * "
            f"WHEN NOT MATCHED THEN INSERT *")
