"""Session-jump ("bounce") detection (SURVEY.md §2.6 W1, §2.8 U3).

Reference: a 2-step CEP pattern per mid — a session-entry event (empty
``last_page_id``) followed *strictly* (`next`) by another session-entry,
``within(10 s)`` event time. Both the PatternSelectFunction (match) and the
PatternTimeoutFunction (timeout) emit the FIRST event, and the two outputs
are unioned (rt/app/dwd/UserJumpDetailApp.java:60-108). So an entry event e
of key k is a jump in every case EXCEPT when the strictly-next event of k
exists, arrives within the gap, and is a non-entry continuation page (that
kills the strict `next` without a timeout):

- next event is another entry within gap  -> CEP match    -> e emitted
- no next event before gap expires        -> CEP timeout  -> e emitted
- next event is a continuation within gap -> pattern dies -> e NOT emitted

Equivalence: ``is_bounce = NOT (next_ts exists AND next_ts - ts < gap AND
next is continuation)`` computed with one ``lead()`` over ALL events per
key — no CEP engine needed. Boundary: CEP ``within(10s)`` is a half-open
[t, t+10) window — a follow-up at exactly +10 s arrives after the timeout
fired, so ``delta >= gap`` -> bounce.

The pure-streaming variant with an event-time timeout lives in
``streaming.stateful``.

Scale: one hash exchange on the key + in-partition sort — the same
exchange a keyed CEP operator pays. No driver-side state, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flinkrealtimedatawarehouse_spark.timeutil import epoch_seconds_col


def mark_bounces(
    events: DataFrame,
    key: str,
    ts_col: str,
    entry_cond: Column,
    gap_seconds: int = 10,
    tiebreak: str | None = None,
) -> DataFrame:
    """Return the entry rows flagged with ``is_bounce`` (1 = jump).

    ``entry_cond`` is the session-entry predicate (the reference's
    ``last_page_id is null or empty``); ``lead`` runs over **all** events of
    the key so an intervening continuation page correctly kills the match
    (the round-1 candidates-only form was wrong in both directions).
    ``tiebreak`` optionally breaks equal-timestamp ordering for determinism.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order)
    flagged = events.withColumn("_is_entry", entry_cond.cast("int"))
    flagged = (
        flagged.withColumn("next_ts", F.lead(ts_col).over(w))
        .withColumn("next_is_entry", F.lead("_is_entry").over(w))
    )
    ts_type = dict(events.dtypes).get(ts_col)
    delta = epoch_seconds_col(F.col("next_ts"), ts_type) - epoch_seconds_col(
        F.col(ts_col), ts_type
    )
    survives = (
        F.col("next_ts").isNotNull()
        & (delta < F.lit(float(gap_seconds)))
        & (F.col("next_is_entry") == F.lit(0))
    )
    return (
        flagged.filter(F.col("_is_entry") == F.lit(1))
        .withColumn("is_bounce", F.when(survives, F.lit(0)).otherwise(F.lit(1)))
        .drop("_is_entry", "next_is_entry", "next_ts")
    )


def bounce_rate_daily(
    events: DataFrame,
    key: str,
    ts_col: str,
    entry_cond: Column,
    gap_seconds: int = 10,
    tiebreak: str | None = None,
) -> DataFrame:
    """DWS consumption: per-day entry count, bounce count, bounce rate
    (uj_ct of VisitorStats + the ADS ratio pub/bean/VisitorStats.java:35-43)."""
    marked = mark_bounces(events, key, ts_col, entry_cond, gap_seconds, tiebreak)
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
