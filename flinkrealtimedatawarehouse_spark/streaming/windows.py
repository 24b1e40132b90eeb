"""Watermarked tumbling event-time aggregations (T1-T3 + streaming A1-A4).

The reference stamps bounded-out-of-orderness watermarks then runs
10-second tumbles in every DWS app (rt/app/dws/VisitorStatsApp.java:129-188,
ProductStatsApp.java:261-313, ProvinceStatsSQLApp.java:69-89,
KeywordStatsApp.java:80-91). The Spark form is
``withWatermark(ts, delay).groupBy(window(ts, size), keys).agg(...)`` in
append mode: a window row is emitted exactly when the watermark passes the
window end, and late rows (ts < watermark) are dropped (T8 — matches the
reference, which has no allowedLateness anywhere).

Exact distinct inside a window uses ``size(collect_set(...))`` — Spark
bans ``countDistinct`` in streaming aggregations, but the per-window set
is bounded state, same value, same guarantee the reference gets from its
merged HashSets (rt/bean/ProductStats.java:107-117).

Scale: state is one entry per open (window x key) group; with a 10 s-10 min
window and a watermark delay of seconds, state size is bounded by key
cardinality, independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flinkrealtimedatawarehouse_spark.operators.aggs import WINDOW_FMT
from flinkrealtimedatawarehouse_spark.timeutil import epoch_seconds_col


def visitor_stats_stream(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "10 minutes",
    delay: str = "30 seconds",
) -> DataFrame:
    """Streaming A1 (VisitorStatsApp.java:133-188): keyed tumble with
    count / sum / exact-distinct measures and stamped window bounds (W2).

    NOTE: do NOT filter watermark-sentinel rows before this operator with
    a source-pushable predicate — Catalyst pushes such filters through the
    EventTimeWatermark node to the parquet scan, row-group stats prune the
    sentinel file entirely, and the watermark never advances. Sentinels
    key to their own group; drop them from the OUTPUT (their window start
    is always past the real max event time).
    """
    return (
        events.withWatermark(ts_col, delay)
        .groupBy(F.window(F.col(ts_col), duration), "event_type")
        .agg(
            F.count(F.lit(1)).alias("pv_ct"),
            F.round(F.sum("value"), 2).alias("value_sum"),
            F.size(F.collect_set("user_id")).alias("uv_ct"),
        )
        .select(
            F.date_format(F.col("window.start"), WINDOW_FMT).alias("stt"),
            F.date_format(F.col("window.end"), WINDOW_FMT).alias("edt"),
            "event_type",
            "pv_ct",
            "value_sum",
            "uv_ct",
        )
    )


def product_stats_stream(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    delay: str = "30 seconds",
) -> DataFrame:
    """Streaming A2 (ProductStatsApp.java:265-313): per-item tumble, item
    key parsed from the JSON payload, exact distinct via collect_set.
    (Sentinel caveat: see visitor_stats_stream.)"""
    parsed = events.withColumn("item_id", F.get_json_object("props", "$.k").cast("int"))
    return (
        parsed.withWatermark(ts_col, delay)
        .groupBy(F.window(F.col(ts_col), duration), "item_id")
        .agg(
            F.count(F.lit(1)).alias("click_ct"),
            F.round(F.sum("value"), 2).alias("amount"),
            F.size(F.collect_set("user_id")).alias("order_ct"),
        )
        .select(
            F.date_format(F.col("window.start"), WINDOW_FMT).alias("stt"),
            F.date_format(F.col("window.end"), WINDOW_FMT).alias("edt"),
            "item_id",
            "click_ct",
            "amount",
            "order_ct",
        )
    )


def sliding_stats_stream(
    events: DataFrame,
    ts_col: str = "ts",
    size: str = "10 minutes",
    slide: str = "5 minutes",
    delay: str = "30 seconds",
) -> DataFrame:
    """Sliding (hopping) event-time windows — the other window family the
    reference discusses alongside sessions (README:374-384) and never
    ships. Each event lands in ``size/slide`` overlapping windows; a
    window row emits when the watermark passes its end.

    Scale: Spark expands each row into its windows BEFORE the partial
    aggregation, so shuffle volume is O(groups x size/slide), still
    independent of row count; state is one entry per open (window x key).
    Keep size/slide ratios small (2-4x) — the expansion factor is the cost.
    """
    return (
        events.withWatermark(ts_col, delay)
        .groupBy(F.window(F.col(ts_col), size, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("pv_ct"), F.round(F.sum("value"), 2).alias("value_sum"))
        .select(
            F.date_format(F.col("window.start"), WINDOW_FMT).alias("stt"),
            F.date_format(F.col("window.end"), WINDOW_FMT).alias("edt"),
            "event_type",
            "pv_ct",
            "value_sum",
        )
    )


def session_stats_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    delay: str = "30 seconds",
) -> DataFrame:
    """Streaming twin of ``operators.sessions.session_stats`` (W4): gap
    sessionization via the built-in ``session_window`` grouping.

    The batch operator's gap compare is aligned to this operator's
    END-INCLUSIVE merge semantics (an event at exactly ``+gap`` extends
    the session) so both produce identical sessions on the same data.

    ``session_window.start`` is the first event's ts, but its ``.end`` is
    ``last_event + gap`` — so the true session bounds/duration are
    aggregated explicitly (min/max of the event time).

    Scale/state: Spark keeps one state row per OPEN session per key and
    merges/evicts on watermark advance — state is bounded by the number of
    keys active within (gap + delay) of the watermark, independent of
    stream length. A session row emits (append mode) once the watermark
    passes ``last_event + gap``.
    """
    ts_type = dict(events.dtypes).get(ts_col)
    return (
        events.withWatermark(ts_col, delay)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            key_col,
            "n_events",
            "session_start",
            "session_end",
            F.round(
                epoch_seconds_col(F.col("session_end"), ts_type)
                - epoch_seconds_col(F.col("session_start"), ts_type),
                6,
            ).alias("dur_sec"),
        )
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    keys: tuple[str, str],
    ts_cols: tuple[str, str],
    lower: str,
    upper: str,
    delay: str = "30 seconds",
    how: str = "inner",
) -> DataFrame:
    """Streaming J1/J2 (rt/app/dwd/OrderWideApp.java:80-88,
    PaymentWideApp.java:97-105): watermarked stream-stream interval join.
    Matches emit on arrival; the watermark + range bound the join state on
    both sides (state eviction horizon = interval width + delay), which is
    exactly how Flink's interval join bounds its buffers.

    ``how="leftOuter"`` extends the reference (Flink's interval join is
    inner-only): a left row with no partner inside the interval emits with
    NULL right columns once the watermark proves no partner can still
    arrive — the same time-range condition is what makes the outer form
    legal in Spark (an unbounded outer stream-stream join is rejected).
    """
    lk, rk = keys
    lts, rts = ts_cols
    lw = left.withWatermark(lts, delay)
    rw = right.withWatermark(rts, delay)
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(rts) >= F.expr(f"{lts} + INTERVAL {lower}"))
        & (F.col(rts) <= F.expr(f"{lts} + INTERVAL {upper}"))
    )
    return lw.join(rw, cond, how)
