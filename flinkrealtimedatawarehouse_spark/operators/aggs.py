"""Keyed tumbling-window aggregations (SURVEY.md §2.5 A1-A4, §2.6 W2/W3).

The reference computes 10-second event-time tumbles with an incremental
ReduceFunction plus a finalize step stamping window bounds
(rt/app/dws/VisitorStatsApp.java:133-188, ProductStatsApp.java:265-313,
ProvinceStatsSQLApp.java:69-89, KeywordStatsApp.java:80-91). In Spark the
whole shape is one ``groupBy(window(ts, ...), keys).agg(...)`` — hash
aggregation is partial+final natively, so the reduce/finalize split is free,
and ``window.start/end`` replace ``TUMBLE_START/TUMBLE_END``.

Scale notes: the agg shuffles once on (window, keys); at 100 TB the number
of groups is bounded by windows x key cardinality, so partial aggregation
collapses the map side before the exchange. Exact distinct inside a bounded
window (A2/A3's HashSet / COUNT(DISTINCT)) is a second shuffle — keep it
only where the reference demands exactness; `approx_count_distinct` is the
documented fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WINDOW_FMT = "yyyy-MM-dd HH:mm:ss"


def window_bounds(ts_col: str, duration: str) -> list:
    """W2/W3: stamp formatted tumble bounds as `stt`/`edt`
    (rt/app/dws/VisitorStatsApp.java:176-188; ProvinceStatsSQLApp.java:71-72)."""
    w = F.window(F.col(ts_col), duration)
    return [
        F.date_format(w.start, WINDOW_FMT).alias("stt"),
        F.date_format(w.end, WINDOW_FMT).alias("edt"),
    ]


def visitor_stats_tumble(events: DataFrame, duration: str = "10 minutes",
                         approx_distinct: bool = False) -> DataFrame:
    """A1: keyed tumble reduce+finalize (VisitorStatsApp.java:133-188).

    Key = event_type (stands in for the (ar, ch, is_new, vc) tuple of the
    reference — same operator shape, keys from the testdata schema);
    measures = row count, value sum, exact distinct users.

    ``approx_distinct=True`` swaps the exact distinct for HyperLogLog
    (``approx_count_distinct``) — ONE shuffle instead of two and O(1)
    state per group; the right trade at 100 TB when the dashboard
    tolerates ~2% error (the reference's HashSet-merge is exact but its
    state is O(distinct keys) per window).
    """
    distinct = (
        F.approx_count_distinct("user_id") if approx_distinct else F.countDistinct("user_id")
    )
    return (
        events.groupBy(F.window("ts", duration), "event_type")
        .agg(
            F.count(F.lit(1)).alias("pv_ct"),
            F.round(F.sum("value"), 2).alias("value_sum"),
            distinct.alias("uv_ct"),
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


def product_stats_tumble(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """A2: per-item tumble with exact distinct (ProductStatsApp.java:265-313).

    The reference merges HashSets of order ids per sku per window and
    finalizes with set sizes; here `props.k` (JSON payload) is the item key
    and `countDistinct(user_id)` is the exact per-window set size — bounded
    state because the window is bounded.
    """
    parsed = events.withColumn("item_id", F.get_json_object("props", "$.k").cast("int"))
    return (
        parsed.groupBy(F.window("ts", duration), "item_id")
        .agg(
            F.count(F.lit(1)).alias("click_ct"),
            F.round(F.sum("value"), 2).alias("amount"),
            F.countDistinct("user_id").alias("order_ct"),
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


def province_stats(orders: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """A3: SQL tumble + COUNT(DISTINCT) + SUM group by province dims
    (rt/app/dws/ProvinceStatsSQLApp.java:69-89).

    Nation plays the province dim and broadcasts (fixed 25 rows at any
    scale). Customer scales linearly with the data — billions of rows at
    100 TB — so it must NOT broadcast: let AQE pick shuffle-hash/sort-merge
    on the o_custkey exchange (round 1 hard-broadcast it; that OOMs every
    executor at scale).
    """
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"), F.col("n_name").alias("province_name"))
        .agg(
            F.countDistinct("o_orderkey").alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("order_amount"),
        )
    )


def keyword_stats(tokens: DataFrame, ts_col: str = "ts", duration: str = "10 seconds") -> DataFrame:
    """A4: keyword + tumble COUNT(*) (KeywordStatsApp.java:80-91).

    Emits the full KEYWORD_STATS_COLUMNS shape: keyword, ct, the literal
    ``source='search'``, stt/edt window bounds (W3,
    KeywordStatsApp.java:83-87) and the window-start epoch ``ts``.
    `tokens` = exploded tokenizer output (F1) with a `word` column.
    """
    return (
        tokens.groupBy(F.window(F.col(ts_col), duration), "word")
        .agg(F.count(F.lit(1)).alias("ct"))
        .select(
            F.col("word").alias("keyword"),
            "ct",
            F.lit("search").alias("source"),
            F.date_format(F.col("window.start"), WINDOW_FMT).alias("stt"),
            F.date_format(F.col("window.end"), WINDOW_FMT).alias("edt"),
            F.unix_timestamp(F.col("window.start")).alias("ts"),
        )
    )
