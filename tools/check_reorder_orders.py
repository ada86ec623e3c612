"""Plan-identity check for the broadcast-gated reorderer at sf100.

The full written-vs-reordered sf100 A/B needs ~80 GB of free disk for
the written-order q7/q21 shuffles (two round-7 attempts died on ENOSPC
at 61 GB free).  The baseline numbers already exist — round-6 §25
in-JVM interleaved A/B and this round's v1 run — so what the gate
change must prove is ORDER IDENTITY: with the broadcast-aware cost the
DP still picks the same sf100 orders whose wins were measured.  This
script compiles the join-heavy queries against the sf100 footer stats
and prints each chain's leaf order (from the compiled SQL's FROM
clause), plus whether a rewrite fired, and optionally times the
REORDERED variant only (small shuffles; fits any disk).

Usage: python tools/check_reorder_orders.py [--sf-dir /tmp/wv/sf100]
       [--time-on] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

TABLES = ["supplier", "lineitem", "orders", "customer", "nation",
          "region", "part"]


def _leaf_order(sql: str) -> list[str]:
    """Table occurrence order inside the FROM clause of the outermost
    query (aliases keep their base table name; good enough to compare
    chain orders)."""
    frm = sql.split(" FROM ", 1)[1] if " FROM " in sql else sql
    frm = frm.split(" WHERE ")[0].split(" GROUP BY ")[0]
    hits = []
    for t in TABLES:
        for m in re.finditer(r"\b" + t + r"\b", frm):
            hits.append((m.start(), t))
    return [t for (_p, t) in sorted(hits)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/wv/sf100")
    ap.add_argument("--queries",
                    default="tpch_q5,tpch_q7,tpch_q21_like,tpch_q10_like,"
                            "tpch_q3,tpch_q18")
    ap.add_argument("--time-on", action="store_true")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import bench
    from wvlet_spark import WvletSession
    from wvlet_spark.suite import SUITE

    spark = bench._make_spark(args.sf_dir, args.cpus)
    ws = WvletSession(spark, table_dir=args.sf_dir, test_mode=False)

    for name in [n.strip() for n in args.queries.split(",") if n.strip()]:
        wv = SUITE[name][0]
        os.environ["WVLET_SPARK_JOIN_REORDER"] = "0"
        off = ws.compile_to_sql(wv)
        os.environ["WVLET_SPARK_JOIN_REORDER"] = "1"
        on = ws.compile_to_sql(wv)
        rec = {"query": name, "rewritten": on != off,
               "order_written": _leaf_order(off),
               "order_on": _leaf_order(on)}
        if args.time_on:
            spark.sql(on).count()          # warm-up
            ts = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                spark.sql(on).count()
                ts.append(time.perf_counter() - t0)
                spark.sparkContext._jvm.System.gc()
                time.sleep(2)
            rec["on_s"] = round(min(ts), 3)
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
