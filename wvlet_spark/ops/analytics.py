"""Product-analytics operators over event streams: funnel conversion,
time-series gap-fill with LOCF, cohort retention.

The reference is an analytics engine (its cdp_behavior / weblog specs
exercise exactly these shapes: reference spec/cdp_behavior/*.wv); these
operators package the shapes as first-class library calls.  All three are
pure DataFrame compositions — no UDFs, every step stays inside
whole-stage codegen, and nothing collects to the driver.

Scale notes (100 TB):
- funnel: each step is filter(event_type) -> per-user min-timestamp
  aggregate -> key join with the previous step's survivors.  The type
  filter pushes into the scan, each aggregate is one (user) shuffle with
  map-side combine, and survivors shrink monotonically, so later joins
  are broadcast-able (AQE decides).  No window over the full event log.
- gap_fill_daily: the calendar is generated per user from its (min, max)
  day span — sequence+explode emits only the needed rows; the LOCF
  window partitions by user (bounded partitions), never globally.
- retention_weekly: distinct (user, week) first (one shuffle that also
  dedups), then a key join against the per-user cohort week.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from wvlet_spark.ops.util import sort_once


def funnel(events: DataFrame, steps: list[str], user_col: str = "user_id",
           type_col: str = "event_type", ts_col: str = "ts",
           within_seconds: int | None = None) -> DataFrame:
    """Ordered-funnel conversion: users whose first `steps[0]` event is
    followed by a `steps[1]` event (strictly later, and within
    `within_seconds` of the previous step when given), and so on.  Each
    step keeps the EARLIEST qualifying timestamp, so the step chain is
    the leftmost path — a user converts iff any path exists with these
    per-hop deadlines relative to the greedy-earliest previous step.

    Returns one row per step: (step_idx, step, users, pct) with pct the
    conversion relative to step 1, rounded to 4 decimals.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    base = events.select(user_col, type_col, ts_col)
    cur = (base.filter(F.col(type_col) == steps[0])
           .groupBy(user_col).agg(F.min(ts_col).alias("__t")))
    stages = [cur]
    for s in steps[1:]:
        nxt = (base.filter(F.col(type_col) == s)
               .withColumnRenamed(ts_col, "__ts")
               .join(cur.select(user_col, "__t"), user_col)
               .filter(F.col("__ts") > F.col("__t")))
        if within_seconds is not None:
            nxt = nxt.filter(
                F.col("__ts") <= F.col("__t")
                + F.expr(f"INTERVAL {int(within_seconds)} SECOND"))
        cur = (nxt.groupBy(user_col)
               .agg(F.min("__ts").alias("__t")))
        stages.append(cur)
    parts = []
    for i, (name, st) in enumerate(zip(steps, stages), start=1):
        parts.append(st.agg(F.count("*").alias("users")).select(
            F.lit(i).cast("long").alias("step_idx"),
            F.lit(name).alias("step"),
            F.col("users").cast("long")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    w = Window.orderBy("step_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return out.withColumn(
        "pct", F.round(F.col("users") / F.first("users").over(w), 4))


def gap_fill_daily(events: DataFrame, user_col: str = "user_id",
                   ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Regularize an event stream to a dense per-user daily series: one
    row per (user, day) over the user's own [first, last] day span, with
    n_events = 0 on gap days and day_value carried forward from the most
    recent day that had events (LOCF).  day_value is round(sum(value), 4)
    — sums of low-precision inputs round stably across engines, unlike
    averages.  The user's first day always has events (the span is
    derived from the events), so LOCF never sees a leading null.
    """
    day = F.to_date(ts_col)
    daily = (events.groupBy(F.col(user_col), day.alias("day"))
             .agg(F.count("*").alias("n_events"),
                  F.round(F.sum(value_col), 4).alias("day_value")))
    # the span derives from the COMPACT daily table, not the raw events:
    # min/max over days-with-events is identical either way, and this
    # turns a second full scan+shuffle of the event stream into a tiny
    # re-aggregation of (user, day) rows (guide §2.3 — round 9; daily is
    # checkpointed above the size threshold because the calendar join
    # consumes it a second time)
    from wvlet_spark.ops.util import materialize_if_big
    daily = materialize_if_big(daily, events)
    span = daily.groupBy(user_col).agg(F.min("day").alias("__d0"),
                                       F.max("day").alias("__d1"))
    cal = span.select(user_col,
                      F.explode(F.sequence("__d0", "__d1")).alias("day"))
    w = (Window.partitionBy(user_col).orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (cal.join(daily, [user_col, "day"], "left")
            .withColumn("n_events",
                        F.coalesce("n_events", F.lit(0)).cast("long"))
            .withColumn("value_filled",
                        F.last("day_value", ignorenulls=True).over(w))
            .drop("day_value"))


def retention_weekly(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Cohort retention: cohort = the Monday-start week of each user's
    first event; for every later week the user was active, count them in
    (cohort_week, week_n) where week_n = full weeks since the cohort
    week.  Returns (cohort_week, week_n, users).
    """
    week = F.date_trunc("week", F.col(ts_col)).cast("date")
    # ONE user-keyed shuffle: collect each user's distinct active weeks
    # (bounded by the observation span — weeks, not events), derive the
    # cohort as the set minimum, and explode.  The previous
    # distinct -> cohort-aggregate -> join cascade shuffled the
    # (user, week) rows twice more and paid a join for a value that is
    # a plain aggregate of the same group (guide §2.3; round 9) —
    # identical results: each user still contributes once per distinct
    # active week, with the same cohort week.
    per_user = (events.select(F.col(user_col), week.alias("week"))
                .groupBy(user_col)
                .agg(F.collect_set("week").alias("__weeks")))
    return (per_user
            .select(F.array_min("__weeks").alias("cohort_week"),
                    F.explode("__weeks").alias("week"))
            .select("cohort_week",
                    (F.datediff("week", "cohort_week") / 7)
                    .cast("long").alias("week_n"))
            .groupBy("cohort_week", "week_n")
            .agg(F.count("*").alias("users"))
            .transform(sort_once, "cohort_week", "week_n", checkpoint=False))


def funnel_latency(events: DataFrame, steps: list[str],
                   user_col: str = "user_id", type_col: str = "event_type",
                   ts_col: str = "ts",
                   within_seconds: int | None = None) -> DataFrame:
    """Funnel with time-to-convert: for every step, the users reaching
    it plus the mean and median (continuous-interpolation) seconds from
    their step-1 timestamp.  Same greedy-earliest step chain as
    funnel(); the latency aggregates run over the per-user step
    timestamps (one tiny aggregate per step, never over the event log).
    Returns (step_idx, step, users, avg_secs, p50_secs), seconds rounded
    to 2 decimals.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    base = events.select(user_col, type_col, ts_col)
    cur = (base.filter(F.col(type_col) == steps[0])
           .groupBy(user_col).agg(F.min(ts_col).alias("__t")))
    first = cur.select(user_col, F.col("__t").alias("__t1"))
    stages = [cur]
    for s in steps[1:]:
        nxt = (base.filter(F.col(type_col) == s)
               .withColumnRenamed(ts_col, "__ts")
               .join(cur.select(user_col, "__t"), user_col)
               .filter(F.col("__ts") > F.col("__t")))
        if within_seconds is not None:
            nxt = nxt.filter(
                F.col("__ts") <= F.col("__t")
                + F.expr(f"INTERVAL {int(within_seconds)} SECOND"))
        cur = nxt.groupBy(user_col).agg(F.min("__ts").alias("__t"))
        stages.append(cur)
    parts = []
    for i, (name, st) in enumerate(zip(steps, stages), start=1):
        # NTZ timestamps need the tz-cast before unix_micros (the
        # session runs in UTC, so the wall clock is preserved)
        secs = (F.unix_micros(F.col("__t").cast("timestamp"))
                - F.unix_micros(F.col("__t1").cast("timestamp"))) / 1e6
        joined = st.join(first, user_col).select(secs.alias("__s"))
        parts.append(joined.agg(
            F.count("*").alias("users"),
            F.round(F.avg("__s"), 2).alias("avg_secs"),
            F.round(F.expr("percentile(__s, 0.5)"), 2).alias("p50_secs"),
        ).select(F.lit(i).cast("long").alias("step_idx"),
                 F.lit(name).alias("step"),
                 F.col("users").cast("long"), "avg_secs", "p50_secs"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
