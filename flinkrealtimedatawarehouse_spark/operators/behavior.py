"""Behavioral analytics: ordered funnels and cohort retention (beyond ref).

The reference's CEP covers one 2-step pattern (entry -> entry, bounce);
real product analytics on the same event stream needs the general forms:

- ``funnel_counts``: k-step ordered funnel. Semantics (deterministic,
  engine-independent, the greedy convention funnel tools use): the anchor
  is the user's FIRST step-1 event; step i+1 is the earliest qualifying
  event at-or-after step i's time and within ``window`` of the anchor.
- ``retention_cohorts``: users grouped by first-seen day; for each
  horizon k, the fraction active exactly k days later.

Scale: both are min-chains / distinct-day reductions keyed on the user —
every stage pre-filters by event type or pre-aggregates to (user, day)
BEFORE shuffling, so each of the k-1 funnel joins moves one row per
qualifying user, not raw events. No UDFs, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    window: str = "30 minutes",
) -> DataFrame:
    """Count users reaching each funnel step in order within ``window``
    of their first step-1 event. Returns (step, step_name, user_ct),
    step 1-indexed; user_ct is non-increasing by construction."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    anchor = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(ts_col).alias("t1"))
        .withColumn("deadline", F.col("t1") + F.expr(f"INTERVAL {window}"))
    )
    reached = anchor.select("u", "t1", "deadline", F.col("t1").alias("t_prev"))
    counts = [(1, steps[0], reached)]
    for i, step in enumerate(steps[1:], start=2):
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("t_ev")
        )
        reached = (
            reached.join(ev, "u")
            .filter((F.col("t_ev") >= F.col("t_prev")) & (F.col("t_ev") <= F.col("deadline")))
            .groupBy("u", "t1", "deadline")
            .agg(F.min("t_ev").alias("t_prev"))
        )
        counts.append((i, step, reached))
    out = None
    for i, name, df in counts:
        row = df.agg(F.count(F.lit(1)).alias("user_ct")).select(
            F.lit(i).alias("step"), F.lit(name).alias("step_name"), "user_ct"
        )
        out = row if out is None else out.unionByName(row)
    return out


def retention_cohorts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    horizons: tuple[int, ...] = (1, 7),
) -> DataFrame:
    """Classic cohort retention: cohort = first-seen day per user;
    ret_k = count of cohort users active exactly k days later. Returns
    (cohort_date string, cohort_size, ret_<k>...).

    Scale: reduces to distinct (user, day) FIRST (the only pass over raw
    events), then one min-agg and one join keyed on the user — shuffle
    volume is bounded by users x active-days, not event count."""
    days = (
        events.select(
            F.col(user_col).alias("u"), F.to_date(ts_col).alias("d")
        ).distinct()
    )
    first = days.groupBy("u").agg(F.min("d").alias("cohort"))
    joined = first.join(days, "u").withColumn("k", F.datediff("d", "cohort"))
    aggs = [F.countDistinct("u").alias("cohort_size")] + [
        F.countDistinct(F.when(F.col("k") == h, F.col("u"))).alias(f"ret_{h}")
        for h in horizons
    ]
    return (
        joined.groupBy(F.date_format("cohort", "yyyy-MM-dd").alias("cohort_date"))
        .agg(*aggs)
    )
