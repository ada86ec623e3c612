#!/usr/bin/env python
"""Measure salted_join against plain and AQE-handled joins under REAL key
skew (round-6 verdict ask: the one SCALE.md 100 TB claim that was
asserted rather than measured).

Data (written once to --dir, DuckDB, seconds): a fact table of --rows
rows whose join key is zipf-ish — a fraction `hot` of all rows share
key 0, the rest are uniform over --keys distinct keys — and a dim table
of --keys rows (~100 B/row) sized well past the 10 MB broadcast
threshold, so the join MUST shuffle: exactly the regime salting exists
for (small-dim cases broadcast and have no skew problem at all).

Matrix: hot fraction x strategy, where strategy is
  plain      AQE off, shuffled-hash preference (the engine's default)
  aqe        AQE on, skew-join on, Spark defaults (256 MB skew threshold)
  aqe_tuned  AQE on, skewedPartitionThresholdInBytes/advisory lowered to
             16 MB/8 MB so the hot partition is actually split
  salted8/32 wvlet_spark.ops.util.salted_join with 8 / 32 buckets

Each cell: median of --repeats warm runs of
  fact JOIN dim ON k -> global sum(v * w)  (tiny result, full join work).
Prints one JSON line; paste the table into SCALE.md.

Usage:
    python tools/bench_skew.py [--rows 40000000] [--keys 2000000]
                               [--dir /tmp/wv/skew] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import time


def gen(d: str, rows: int, keys: int, hots: list[float]) -> None:
    import duckdb

    os.makedirs(d, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for hot in hots:
        f = f"{d}/fact_h{int(hot * 100)}.parquet"
        if os.path.exists(f):
            continue
        con.execute(
            f"COPY (SELECT CASE WHEN random() < {hot} THEN 0 "
            f"ELSE 1 + CAST(floor(random() * {keys - 1}) AS BIGINT) END AS k, "
            f"random() AS v FROM range({rows})) TO '{f}' "
            f"(FORMAT parquet, ROW_GROUP_SIZE 1048576)")
    if not os.path.exists(f"{d}/dim.parquet"):
        con.execute(
            f"COPY (SELECT range AS k, random() AS w, "
            f"repeat('x', 80) AS pad FROM range({keys})) "
            f"TO '{d}/dim.parquet' (FORMAT parquet, ROW_GROUP_SIZE 1048576)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=40_000_000)
    ap.add_argument("--keys", type=int, default=2_000_000)
    ap.add_argument("--dir", default="/tmp/wv/skew")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--hots", default="0,30,60")
    args = ap.parse_args()
    hots = [int(h) / 100 for h in args.hots.split(",")]
    gen(args.dir, args.rows, args.keys, hots)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from wvlet_spark.ops.util import salted_join

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.sql.autoBroadcastJoinThreshold", str(10 << 20))
             .config("spark.ui.enabled", "false")
             .appName("bench_skew").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    BASE = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            str(256 << 20),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(64 << 20),
        "spark.sql.join.preferSortMergeJoin": "false",
    }
    CONFS = {
        "plain": {"spark.sql.adaptive.enabled": "false"},
        "aqe": {},
        "aqe_tuned": {
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                str(16 << 20),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(8 << 20),
        },
        "salted8": {},
        "salted32": {},
        # two-path: hot keys (known up front, e.g. from skew_report)
        # broadcast map-join; uniform remainder plain shuffle join
        "two_path": {},
    }

    results: dict[str, dict[str, float]] = {}
    for hot in hots:
        row: dict[str, float] = {}
        for strat, conf in CONFS.items():
            for k, v in {**BASE, **conf}.items():
                spark.conf.set(k, v)
            times = []
            for _ in range(args.repeats):
                # REBUILD the plan from fresh reads each repeat: a second
                # collect() of the same DataFrame reuses the first run's
                # shuffle files and measures ~0 (observed: 9.8 s then
                # 0.04 s) — fresh lineage forces the real work
                fact = spark.read.parquet(
                    f"{args.dir}/fact_h{int(hot * 100)}.parquet")
                dim = spark.read.parquet(
                    f"{args.dir}/dim.parquet").drop("pad")
                if strat == "two_path":
                    j = salted_join(fact, dim, on=["k"], hot_keys=[0])
                elif strat.startswith("salted"):
                    j = salted_join(fact, dim, on=["k"],
                                    buckets=int(strat[len("salted"):]))
                else:
                    j = fact.join(dim, on="k")
                q = j.agg(F.sum(F.col("v") * F.col("w")).alias("s"))
                t0 = time.time()
                q.collect()
                times.append(time.time() - t0)
            row[strat] = round(statistics.median(times), 2)
            print(f"hot={hot} {strat}: {row[strat]} s  (runs: "
                  f"{[round(t, 2) for t in times]})", flush=True)
        results[f"hot_{int(hot * 100)}"] = row
    print(json.dumps({"metric": "skew_join_matrix", "rows": args.rows,
                      "keys": args.keys, "cpus": args.cpus,
                      "results": results}))


if __name__ == "__main__":
    main()
