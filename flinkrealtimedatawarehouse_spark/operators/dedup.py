"""Stateful dedup — daily unique visitors (SURVEY.md §2.5 A5).

Reference: keyBy(mid), keep a row only if `last_page_id` is empty AND the
stored date differs from today's; ValueState with 24 h TTL
(rt/app/dwd/UniqueVisitApp.java:52-90). Batch form: the "first event of the
(key, day)" — `dropDuplicates` on (key, day) after the entry filter; the
TTL is exactly the day-grain of the key. Streaming form:
``streaming.state.streaming_dedup`` (watermarked dropDuplicates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def daily_unique(
    events: DataFrame,
    key: str,
    ts_col: str,
    entry_filter: Column | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """FIRST event per (key, event_date) — deterministic via row_number over
    ts (the reference keeps the first-seen row, UniqueVisitApp.java:52-90;
    round-1 dropDuplicates kept an arbitrary one). At scale this is one
    shuffle on (key, date); no global state — the day bound is the TTL."""
    df = events.filter(entry_filter) if entry_filter is not None else events
    df = df.withColumn("event_date", F.to_date(ts_col))
    order = [F.col(ts_col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy("event_date", key).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def daily_unique_counts(events: DataFrame, key: str, ts_col: str) -> DataFrame:
    """UV counts per day — the DWS consumption of A5."""
    return (
        daily_unique(events, key, ts_col)
        .groupBy("event_date")
        .agg(F.count(F.lit(1)).alias("uv_ct"))
        .select(F.date_format("event_date", "yyyy-MM-dd").alias("dt"), "uv_ct")
    )
