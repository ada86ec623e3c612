"""TPC-H q21 probe pre-aggregation A/B (round-6 verdict ask #3,
SCALE.md §24 follow-up).

The suite q21 lowers its EXISTS / NOT EXISTS probes to a semi join and
an anti join, each shuffling the FULL lineitem table on l_orderkey —
three lineitem shuffles total (~30 GB at sf100), the heaviest absolute
query in the suite.  Both probes are correlated on the SAME table and
key with only a supplier-inequality inner conjunct, so they collapse
into ONE pre-aggregation (the Neumann-Kemper unnesting shape):

  per (l_orderkey, l_suppkey):  has_r = max(l_returnflag = 'R')
  per l_orderkey:               n_supp = count(*), n_supp_r = sum(has_r)

  EXISTS(other supplier)              <=> n_supp   > 1
  NOT EXISTS(other 'R' supplier)      <=> n_supp_r = 1   (l1 itself is
                                          an 'R' row of the order)

The first aggregate gets full map-side combine (600 M rows -> ~order x
supplier pairs) and no Expand (the count-distinct form would double
rows through the shuffle); the second runs over the already-tiny
per-supplier table.

This harness runs written-vs-rewritten interleaved (min-of-N), verifies
identical results (sorted row hash), and prints one JSON line per
scale.  Usage:
    python tools/bench_q21.py [--sf-dir /tmp/wv/sf10] [--repeats 3]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

REWRITTEN = """
WITH per_supp AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
  FROM lineitem GROUP BY l_orderkey, l_suppkey
),
ord AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(has_r) AS n_supp_r
  FROM per_supp GROUP BY l_orderkey
)
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN ord ON ord.l_orderkey = l1.l_orderkey
JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_4'
WHERE l1.l_returnflag = 'R' AND ord.n_supp > 1 AND ord.n_supp_r = 1
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
"""


def _row_hash(df) -> str:
    rows = sorted(map(str, (tuple(r) for r in df.collect())))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/wv/sf10")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--variant", default="both",
                    choices=["both", "written", "rewritten"],
                    help="time one side only (sf100: the written side's "
                         "shuffle needs its own JVM — see time_one.py)")
    ap.add_argument("--skip-verify", action="store_true",
                    help="skip the row-hash equivalence check (already "
                         "proven at a smaller sf on the same generator)")
    args = ap.parse_args()

    import bench
    from wvlet_spark import WvletSession
    from wvlet_spark.suite import SUITE

    spark = bench._make_spark(args.sf_dir, args.cpus)
    ws = WvletSession(spark, table_dir=args.sf_dir, test_mode=False)
    written_sql = ws.compile_to_sql(SUITE["tpch_q21_like"][0])

    if not args.skip_verify:
        h_written = _row_hash(spark.sql(written_sql))
        h_rewritten = _row_hash(spark.sql(REWRITTEN))
        assert h_written == h_rewritten, "rewrite changed results"

    variants = {"written": written_sql, "rewritten": REWRITTEN}
    if args.variant != "both":
        variants = {args.variant: variants[args.variant]}
    times = {v: [] for v in variants}
    for _ in range(args.repeats):
        for variant, sql in variants.items():
            t0 = time.perf_counter()
            spark.sql(sql).count()
            times[variant].append(time.perf_counter() - t0)
            # reap finished shuffle files (ENOSPC postmortem, SCALE §30)
            spark.sparkContext._jvm.System.gc()
            time.sleep(2)
    out = {"sf_dir": args.sf_dir, "repeats": args.repeats,
           "results_match": None if args.skip_verify else True}
    for v, ts in times.items():
        out[f"{v}_s"] = round(min(ts), 3)
    if len(times) == 2:
        out["speedup"] = round(out["written_s"]
                               / max(out["rewritten_s"], 1e-9), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
