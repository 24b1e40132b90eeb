"""Gap-based sessionization (beyond the reference's own operator set).

The reference discusses session windows and rejects them for its bounce
use case (README:374-384 — a session gap would swallow the single-jump
visits CEP must catch); it never ships a sessionizer. A training-data /
analytics pipeline needs one anyway (user-session construction is the
grouping key for behavior corpora), so this module provides the classic
event-time gap sessionizer as a pure DataFrame composition.

Semantics match Spark's built-in ``session_window`` exactly (verified
empirically — the streaming twin in ``streaming/windows.py`` groups by
``F.session_window`` and must produce identical sessions): an event
belongs to the same session as its predecessor iff ``ts - prev_ts <=
gap`` — the gap is END-INCLUSIVE, an event at exactly ``+gap`` still
extends the session; the first strictly-later event opens a new one.
First event per key opens session 0.

Scale: one hash exchange on the key plus a per-key sort — the same cost a
keyed session-window operator pays in any engine; no driver-side state,
no iteration. Session ids are per-key dense integers (not global), so the
computation never needs a global ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flinkrealtimedatawarehouse_spark.timeutil import epoch_seconds_col


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Stamp each event with ``session_idx`` (0-based per key, ordered by
    event time) and ``is_session_start``.

    ``tiebreak`` orders equal timestamps deterministically (pass a unique
    column like an event id whenever duplicates are possible).
    """
    order = [F.col(ts_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    # microsecond-exact gap compare via timeutil.epoch_seconds_col (handles
    # timestamp / timestamp_ntz / numeric inputs): epoch seconds with the
    # fractional part is exact in a 53-bit mantissa for epoch ~2^31 +
    # micros, and identical to DuckDB's epoch(ts) — a long cast would
    # truncate micros and mis-place events that straddle a whole-second
    # gap boundary
    ts_type = dict(df.dtypes).get(ts_col)
    is_start = F.when(
        prev_ts.isNull()
        | (
            epoch_seconds_col(F.col(ts_col), ts_type)
            - epoch_seconds_col(prev_ts, ts_type)
            > F.lit(float(gap_seconds))
        ),
        1,
    ).otherwise(0)
    run = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("is_session_start", is_start).withColumn(
        "session_idx", (F.sum("is_session_start").over(run) - 1).cast("long")
    )


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """One row per (key, session): event count, start/end, duration sec.

    Two-phase plan: the sessionize exchange on ``key_col`` is reused by the
    subsequent groupBy (same partitioning — Catalyst plans no second
    exchange before the partial agg).
    """
    s = sessionize(df, key_col, ts_col, gap_seconds, tiebreak)
    ts_type = dict(df.dtypes).get(ts_col)
    return s.groupBy(key_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.round(
            epoch_seconds_col(F.max(ts_col), ts_type)
            - epoch_seconds_col(F.min(ts_col), ts_type),
            6,
        ).alias("dur_sec"),
    )
