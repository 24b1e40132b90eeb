"""Stateful dedup — daily unique visitors (SURVEY.md §2.5 A5).

Reference: keyBy(mid), keep a row only if `last_page_id` is empty AND the
stored date differs from today's; ValueState with 24 h TTL
(rt/app/dwd/UniqueVisitApp.java:52-90). Batch form: the "first event of the
(key, day)" — `dropDuplicates` on (key, day) after the entry filter; the
TTL is exactly the day-grain of the key. Streaming form lives in
``streaming.jobs`` (watermarked dropDuplicates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def daily_unique(events: DataFrame, key: str, ts_col: str, entry_filter: Column | None = None) -> DataFrame:
    """First event per (key, event_date). At scale this is one shuffle on
    (key, date); no global state — the day bound is the TTL."""
    df = events.filter(entry_filter) if entry_filter is not None else events
    df = df.withColumn("event_date", F.to_date(ts_col))
    return df.dropDuplicates(["event_date", key])


def daily_unique_counts(events: DataFrame, key: str, ts_col: str) -> DataFrame:
    """UV counts per day — the DWS consumption of A5."""
    return (
        daily_unique(events, key, ts_col)
        .groupBy("event_date")
        .agg(F.count(F.lit(1)).alias("uv_ct"))
        .select(F.date_format("event_date", "yyyy-MM-dd").alias("dt"), "uv_ct")
    )
