"""Interleaved A/B of the join-reorder pass at a given scale factor.

Round-6 verdict finding: the pure-C_out reorderer regressed
broadcast-dominated scales (judge-measured sf1 q7 +38%, q5 +15% —
a BroadcastHashJoin turned into SortMergeJoin + extra exchange).  The
round-7 fix costs broadcast-able steps ~0 (joinorder._step_cost); this
harness is the gate's acceptance test: min-of-N interleaved on/off runs
of the join-heavy suite queries, plus a physical plan-shape diff
(BHJ/SMJ/exchange counts), on the same live session.

Usage: python tools/bench_reorder_ab.py [--sf-dir /tmp/wv/sf1]
       [--queries tpch_q5,tpch_q7] [--repeats 3]
Prints one JSON line per query and a summary verdict.
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


def _plan_shape(spark, sql: str) -> dict:
    df = spark.sql(sql)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF1_DIR", "/tmp/wv/sf1"))
    ap.add_argument("--queries", default="tpch_q5,tpch_q7,tpch_q8_like")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    if not (os.path.isdir(args.sf_dir)
            and any(f.endswith(".parquet") for f in os.listdir(args.sf_dir))):
        subprocess.run([sys.executable, os.path.join(HERE, "tools", "gen_sf1.py"),
                        "--out", args.sf_dir], check=True)

    import bench
    from wvlet_spark import WvletSession
    from wvlet_spark.suite import SUITE

    spark = bench._make_spark(args.sf_dir, args.cpus)
    ws = WvletSession(spark, table_dir=args.sf_dir, test_mode=False)

    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    compiled: dict[str, dict[str, str]] = {}
    for name in names:
        wv = SUITE[name][0]
        os.environ["WVLET_SPARK_JOIN_REORDER"] = "0"
        off = ws.compile_to_sql(wv)
        os.environ["WVLET_SPARK_JOIN_REORDER"] = "1"
        on = ws.compile_to_sql(wv)
        compiled[name] = {"off": off, "on": on}

    def _gc():
        # shuffle files live until ContextCleaner sees their RDDs
        # garbage-collected; with a 96 g heap the JVM never GCs on its
        # own and repeated sf100 q21 runs (~30 GB of shuffle each)
        # filled the disk (round-7: two runs died on ENOSPC at the same
        # stage).  Force a GC after every measured run so the cleaner
        # can reap the previous run's shuffle dirs.
        spark.sparkContext._jvm.System.gc()
        time.sleep(2)

    # warm-up (footers, codegen) untimed
    for name in names:
        for variant in ("off", "on"):
            spark.sql(compiled[name][variant]).count()
            _gc()

    results = {}
    for name in names:
        times = {"off": [], "on": []}
        for _ in range(args.repeats):
            for variant in ("off", "on"):   # interleaved: noise hits both
                t0 = time.perf_counter()
                spark.sql(compiled[name][variant]).count()
                times[variant].append(time.perf_counter() - t0)
                _gc()
        shapes = {v: _plan_shape(spark, compiled[name][v]) for v in times}
        rewritten = compiled[name]["on"] != compiled[name]["off"]
        off_t, on_t = min(times["off"]), min(times["on"])
        results[name] = {
            "off_s": round(off_t, 3), "on_s": round(on_t, 3),
            "ratio_on_over_off": round(on_t / max(off_t, 1e-9), 3),
            "rewritten": rewritten,
            "shape_off": shapes["off"], "shape_on": shapes["on"],
        }
        print(json.dumps({name: results[name]}))

    # only rewritten queries can regress — identical compiled SQL on
    # both sides measures box noise, not the pass
    rewritten = [r["ratio_on_over_off"] for r in results.values()
                 if r["rewritten"]]
    worst = max(rewritten) if rewritten else 1.0
    print(json.dumps({"sf_dir": args.sf_dir, "repeats": args.repeats,
                      "n_rewritten": len(rewritten), "worst_ratio": worst,
                      "verdict": "FLAT" if worst <= 1.05 else "REGRESSION"}))


if __name__ == "__main__":
    main()
