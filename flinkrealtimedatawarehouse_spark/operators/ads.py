"""ADS serving layer (SURVEY.md §2.5 A7-A11, §2.7 O1-O2).

The reference serves dashboards from ClickHouse SQL in MyBatis mappers
(pub/mapper/*.java) over the pre-joined DWS "wide" tables — single-table
queries by design (J6, README:404-410). Here each mapper query is a
DataFrame function over the same gold-table shapes; all of them are pure
group/filter/order/limit — fully Catalyst-optimizable, no shuffles beyond
the one hash agg, and each limit is executed as a partial top-N per
partition + final merge (TakeOrderedAndProject), which is exactly what you
want at 100 TB.

The join-avoidance half of J6 — pay the star join once at build, serve
every mapper single-table — is implemented in serving.py
(build_wide_product / WIDE_SERVING_VIEWS) and plan-gated by
tests/test_serving.py::test_wide_gold_serving_avoids_joins (zero join
nodes in the serving plans, rows hash-equal the normalized twins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gmv_day(product_stats: DataFrame, amount_col: str, stt_col: str, day_yyyymmdd: str) -> DataFrame:
    """A10: whole-day GMV — ``sum(order_amount) where toYYYYMMDD(stt)=#{date}``
    (pub/mapper/ProductStatsMapper.java:15-16)."""
    return (
        product_stats.filter(F.date_format(F.col(stt_col), "yyyyMMdd") == F.lit(day_yyyymmdd))
        .agg(F.round(F.coalesce(F.sum(amount_col), F.lit(0.0)), 2).alias("gmv"))
    )


def topn_sum(
    stats: DataFrame,
    dim_col: str,
    amount_col: str,
    n: int,
    having_gt: float = 0.0,
) -> DataFrame:
    """A7/O1: ``sum(x) group by dim having sum(x)>0 order by sum desc limit N``
    (pub/mapper/ProductStatsMapper.java:21-41 — trademark/category3/spu).

    Tie-broken on the dim for determinism. Physical plan: partial agg →
    one exchange → TakeOrderedAndProject (per-partition top-N + merge).
    """
    return (
        stats.groupBy(dim_col)
        .agg(F.round(F.sum(amount_col), 2).alias("order_amount"))
        .filter(F.col("order_amount") > F.lit(having_gt))
        .orderBy(F.col("order_amount").desc(), F.col(dim_col).asc())
        .limit(n)
    )


def hourly_conditional(visitor_stats: DataFrame, stt_col: str, is_new_col: str,
                       uv_col: str, pv_col: str) -> DataFrame:
    """A8/O2: hour series with conditional agg —
    ``sum(if(is_new='1', uv_ct, 0)) new_uv, toHour(stt) hr ... group/order by hr``
    (pub/mapper/VisitorStatsMapper.java:22-25)."""
    return (
        visitor_stats.groupBy(F.hour(F.col(stt_col)).alias("hr"))
        .agg(
            F.sum(F.when(F.col(is_new_col) == "1", F.col(uv_col)).otherwise(F.lit(0))).alias("new_uv"),
            F.sum(uv_col).alias("uv_ct"),
            F.sum(pv_col).alias("pv_ct"),
        )
        .orderBy("hr")
    )


def keyword_score(keyword_stats: DataFrame, keyword_col: str, ct_col: str,
                  source_col: str, weights: dict[str, int], n: int) -> DataFrame:
    """A9: weighted keyword scoring —
    ``sum(ct * multiIf(source='SEARCH',10,'ORDER',3,'CART',2,'CLICK',1,0))``
    (pub/mapper/KeywordStatsMapper.java:15-20). ``multiIf`` = chained
    when/otherwise (CASE)."""
    weight: Column = F.lit(0)
    expr = None
    for src, w in weights.items():
        cond = F.col(source_col) == F.lit(src)
        expr = F.when(cond, F.lit(w)) if expr is None else expr.when(cond, F.lit(w))
    weight = expr.otherwise(F.lit(0)) if expr is not None else weight
    return (
        keyword_stats.groupBy(F.col(keyword_col).alias("keyword"))
        .agg(F.sum(F.col(ct_col) * weight).alias("ct"))
        .orderBy(F.col("ct").desc(), F.col("keyword").asc())
        .limit(n)
    )


def grain_rollup(stats: DataFrame, dims: list[str], amount_col: str) -> DataFrame:
    """Multi-grain serving rollup in ONE pass: GROUPING SETS over each
    single dimension plus the grand total.

    The reference's ADS layer answers each grain with a separate ClickHouse
    query per mapper (pub/mapper/ProductStatsMapper.java:15-41 — gmv = the
    () grain, trademark/category3/spu top-Ns = one grain each). Here one
    GROUPING SETS aggregate computes every grain in a single shuffle: the
    Expand operator emits one row per grouping set per input row, and the
    partial hash agg collapses them map-side — at 100 TB that is one scan
    + one exchange instead of |grains| scans. Absent dims are tagged 'ALL'
    (inputs are non-null by construction in TPC-H-shaped data).
    """
    sets = [[F.col(d)] for d in dims] + [[]]
    agg = stats.groupingSets(sets, *[F.col(d) for d in dims]).agg(
        F.round(F.sum(amount_col), 2).alias("amount"),
        F.count(F.lit(1)).alias("row_ct"),
    )
    out_cols = [F.coalesce(F.col(d), F.lit("ALL")).alias(d) for d in dims]
    return agg.select(*out_cols, "amount", "row_ct")


def rolling_metrics(
    daily: DataFrame,
    date_col: str,
    amount_col: str,
    n_days: int = 7,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Rolling serving metrics over a daily series: N-day moving average
    (a true time-RANGE frame over the epoch-day, so calendar gaps count as
    missing days — not a row frame) and the running cumulative total.

    Beyond the reference: its dashboards re-query whole-day aggregates per
    request (pub/mapper/ProductStatsMapper.java:15-16); trend lines need
    frames, which the reference has nowhere (SURVEY §2.6: no frame specs).

    Scale: frames run inside one exchange on ``partition_cols``. An
    unpartitioned series funnels through a single task — acceptable only
    because the input is an already-aggregated daily table (rows = days);
    for per-key trends pass ``partition_cols`` and the window parallelizes
    per key.
    """
    part = partition_cols or []
    dayn = F.datediff(F.col(date_col), F.lit("1970-01-01"))
    d = daily.withColumn("_dayn", dayn)
    w_ma = Window.partitionBy(*part).orderBy("_dayn").rangeBetween(-(n_days - 1), 0)
    w_cum = Window.partitionBy(*part).orderBy("_dayn").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        d.withColumn(f"ma{n_days}", F.round(F.avg(amount_col).over(w_ma), 2))
        .withColumn("cume", F.round(F.sum(amount_col).over(w_cum), 2))
        .drop("_dayn")
    )


def fill_gaps(
    daily: DataFrame,
    date_col: str,
    value_col: str,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Calendar gap filling for a daily series: emit one row per day
    between each partition's min and max date, forward-filling
    ``value_col`` from the last observed day and flagging synthesized
    rows with ``is_filled``. Dashboards and window frames both need a
    dense axis; the reference has no gap handling at all (a missing
    ClickHouse row simply vanishes from the chart).

    Scale: the calendar is generated per partition with ``sequence``
    (rows = days in range — tiny next to the fact data), joined back on
    (partition, day); the forward fill is ``last(ignorenulls)`` inside
    the same per-partition exchange the join already made.
    """
    part = partition_cols or []
    bounds = daily.groupBy(*part).agg(
        F.min(F.to_date(date_col)).alias("_mn"), F.max(F.to_date(date_col)).alias("_mx")
    )
    cal = bounds.select(
        *part,
        F.explode(F.sequence("_mn", "_mx", F.expr("INTERVAL 1 DAY"))).alias(date_col),
    )
    src = daily.select(
        *part, F.to_date(date_col).alias(date_col), F.col(value_col)
    )
    joined = cal.join(src, [*part, date_col], "left")
    w = (
        Window.partitionBy(*part)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        *part,
        date_col,
        F.last(value_col, ignorenulls=True).over(w).alias(value_col),
        F.when(F.col(value_col).isNull(), 1).otherwise(0).alias("is_filled"),
    )


def pivot_matrix(
    events: DataFrame,
    row_col,
    pivot_col: str,
    values: list[str],
    agg_col: str | None = None,
) -> DataFrame:
    """Serving matrix: one row per ``row_col``, one column per pivot value
    — the wide shape dashboards consume directly (hour x event-type grid).

    ``values`` is mandatory by design: an explicit value list keeps the
    output schema stable at any scale AND skips the extra
    distinct-discovery job Spark otherwise runs over the full input.
    Physically a pivot is a plain hash agg with |values| conditional
    measures — one scan, one exchange, no other shuffle.
    """
    gp = events.groupBy(row_col).pivot(pivot_col, values)
    return gp.count() if agg_col is None else gp.agg(F.round(F.sum(agg_col), 2))


def visitor_ratios(visitor_stats: DataFrame, uj_col: str, sv_col: str,
                   dur_col: str, pv_col: str) -> DataFrame:
    """A11: derived ratio metrics the reference computes in the bean
    (pub/bean/VisitorStats.java:35-64): bounce rate uj*100/sv, avg visit
    duration dur/sv/1000, pages per visit pv/sv — division guarded like the
    bean's try/catch(/0)."""
    sv = F.col(sv_col)
    guard = lambda num: F.when(sv != 0, F.round(num, 2)).otherwise(F.lit(0.0))  # noqa: E731
    return visitor_stats.withColumns(
        {
            "bounce_rate": guard(F.col(uj_col) * 100.0 / sv),
            "avg_dur_sec": guard(F.col(dur_col) / sv / 1000.0),
            "pv_per_visit": guard(F.col(pv_col) / sv),
        }
    )
