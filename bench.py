#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall time of one full pass over the headline query set
(median of 3 passes per query, excluding Spark/session startup).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


HEADLINE = [
    # engine-compiled wvlet queries (name -> from suite)
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q7",
    "tpch_q10_like", "tpch_q13", "tpch_q18", "tpch_q21_like",
    "in_subquery", "exists_subquery", "window_rank", "having_filter",
    "agg_sugar", "date_funcs", "with_cte", "pivot_status",
    # native extension operators
    "ext_exact_dedup", "ext_minhash_pairs", "ext_cosine_topk",
    "ext_language_id", "ext_quality_score", "ext_token_stats",
]

REPEATS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    # Size scan splits to the data so every core participates: a single
    # 100 MB parquet file must not become one scan task on a 32-core box.
    # (At cluster scale the 128 MB default is right; locally we split finer.)
    try:
        total_bytes = sum(
            os.path.getsize(os.path.join(sf_dir, f))
            for f in os.listdir(sf_dir) if f.endswith(".parquet")
        )
    except OSError:
        total_bytes = 0
    # Scale-aware knobs.  Toy inputs (less than ~16 MB per core, e.g. the
    # 17 MB sf0.1 gate data) are dominated by per-task scheduling and
    # shuffle setup: coarse 128 MB splits + eager 64 MB broadcast win there
    # (measured 15s vs 32s for the suite at sf0.1).  At real scale the
    # fine data/(cores*3) split sizing and the 10 MB broadcast default
    # win instead (64 MB made Spark broadcast million-row tables off
    # parquet-size estimates: 3-5x slower joins at sf1; AQE still
    # upgrades small sides at runtime from exact sizes).
    if total_bytes < int(cpus) * 16 * 1024 * 1024:
        # toy scale: fewer shuffle buckets also cuts per-stage scheduling
        max_part, bcast_default, shuffle_default = 128, 64, 8
    else:
        max_part = min(128, max(32, (total_bytes // (int(cpus) * 3)) >> 20))
        bcast_default, shuffle_default = 10, max(8, int(cpus))
    max_part = int(os.environ.get("SPARK_GRAFT_MAXPART_MB", max_part))
    bcast_mb = int(os.environ.get("SPARK_GRAFT_BCAST_MB", bcast_default))
    shuffle_n = int(os.environ.get("SPARK_GRAFT_SHUFFLE", shuffle_default))

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(max_part * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
        .config("spark.sql.autoBroadcastJoinThreshold", str(bcast_mb * 1024 * 1024))
        # keep the 10 MB default broadcast threshold: a static 64 MB limit
        # makes Spark broadcast million-row tables off parquet-size estimates
        # (measured 3-5x slower joins); AQE still upgrades small sides at
        # runtime from exact sizes.
        .appName("wvlet_spark-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from wvlet_spark import WvletSession
    from wvlet_spark.ops import entry_queries
    from wvlet_spark.suite import SUITE

    ws = WvletSession(spark, table_dir=sf_dir, test_mode=False)
    ext = entry_queries()

    def run_once(name: str) -> None:
        if name in SUITE:
            df = ws.run(SUITE[name][0])
        else:
            df = ext[name](spark, sf_dir)
        # count() forces full execution without driver-side row transfer
        df.count()
        # release intermediates the query materialized (minhash localCheckpoints
        # its signature table): leaving them pinned squeezes execution memory
        # and makes later big-join queries spill (measured: q18 2.1s -> 3.7s
        # at sf1 with 4 stale checkpoints). Equivalent of "drop temp table".
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()

    # warm-up: JVM/codegen + file footers (one pass, untimed)
    for name in HEADLINE:
        run_once(name)

    per_query: dict[str, float] = {}
    for name in HEADLINE:
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            run_once(name)
            times.append(time.perf_counter() - t0)
        per_query[name] = round(statistics.median(times), 4)

    total = round(sum(per_query.values()), 4)

    # DuckDB companion timings on the identical parquet — the same-scale
    # baseline anchor, recorded in the same JSON line.  Headline queries
    # without a DuckDB-expressible oracle (hash-based LSH ops) are omitted.
    duck: dict[str, float] = {}
    try:
        import duckdb

        from wvlet_spark.ops import entry_oracles

        oracles: dict[str, str] = {}
        for name in HEADLINE:
            if name in SUITE and SUITE[name][1]:
                oracles[name] = SUITE[name][1]
        for name, osql in entry_oracles().items():
            if name in HEADLINE:
                oracles[name] = osql
        con = duckdb.connect()
        for f in sorted(os.listdir(sf_dir)):
            if f.endswith(".parquet"):
                con.execute(
                    f"CREATE VIEW {f[:-8]} AS SELECT * FROM '{sf_dir}/{f}'")
        for name, osql in oracles.items():
            con.execute(osql).fetchall()  # warm-up (buffer cache)
            times = []
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                con.execute(osql).fetchall()
                times.append(time.perf_counter() - t0)
            duck[name] = round(statistics.median(times), 4)
    except Exception:
        duck = {}

    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(json.dumps({
        "metric": "headline_suite_total_wall",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "duckdb": duck,
        "duckdb_total": round(sum(duck.values()), 4),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": int(cpus),
        "repeats": REPEATS,
    }))


if __name__ == "__main__":
    main()
