"""Session-jump ("bounce") detection (SURVEY.md §2.6 W1).

Reference: a 2-step CEP pattern per mid — session-entry event followed
strictly by another session-entry within 10 s; the FIRST event is a bounce
when the follow-up does NOT arrive in time (match → not bounce, timeout →
bounce), match+timeout unioned (rt/app/dwd/UserJumpDetailApp.java:54-108).

Equivalence (SURVEY.md §7.4.1): entry event e of key k is a bounce iff the
next entry event of k is ≥ gap away in event time, or absent. That is one
`lead()` over (key, ts) — no CEP engine needed; the pure-streaming variant
with an event-time timeout lives in ``streaming.stateful``.

Scale: one shuffle to (key)-partition + in-partition sort; at 100 TB this
is the same exchange a keyed CEP operator would do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def mark_bounces(
    events: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int = 10,
    candidate_filter: Column | None = None,
) -> DataFrame:
    """Return candidate rows with an `is_bounce` flag.

    Boundary semantics match CEP `within(10s)`: a follow-up at exactly
    `gap_seconds` is OUTSIDE the window (Flink's within is a strict bound on
    the match), so `next_ts - ts >= gap` → bounce.
    """
    cand = events.filter(candidate_filter) if candidate_filter is not None else events
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    return cand.withColumn("next_ts", F.lead(ts_col).over(w)).withColumn(
        "is_bounce",
        F.when(
            F.col("next_ts").isNull()
            | (F.col("next_ts").cast("double") - F.col(ts_col).cast("double") >= F.lit(float(gap_seconds))),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )


def bounce_rate_daily(events: DataFrame, key: str, ts_col: str, gap_seconds: int = 600) -> DataFrame:
    """DWS consumption: per-day session count, bounce count, bounce rate
    (the uj_ct measure of VisitorStats + the ADS ratio
    pub/bean/VisitorStats.java:35-43)."""
    marked = mark_bounces(events, key, ts_col, gap_seconds)
    return (
        marked.groupBy(F.to_date(ts_col).alias("d"))
        .agg(
            F.count(F.lit(1)).alias("sv_ct"),
            F.sum("is_bounce").alias("uj_ct"),
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("dt"),
            "sv_ct",
            "uj_ct",
            F.round(F.col("uj_ct") * 100.0 / F.col("sv_ct"), 2).alias("bounce_rate"),
        )
    )
