"""SQL serving surface — the reference's ADS layer as Spark SQL views.

The reference serves every dashboard query as SQL (MyBatis mappers over
ClickHouse: pub/mapper/ProductStatsMapper.java, VisitorStatsMapper.java,
KeywordStatsMapper.java, wired by pub/controller/SugarController.java).
``register_serving_views`` reproduces that surface: after one call, a SQL
user runs the same queries via ``spark.sql("SELECT ... FROM ads_*")`` with
no DataFrame code — the second of the two APIs over one runtime that the
reference demonstrates (SURVEY.md §3.3: DataStream ops + SQL on Blink ==
DataFrame + spark.sql on Catalyst).

Views are lazy: each is a logical plan over the base tables; Catalyst
prunes/pushes through them exactly as for the DataFrame twins (asserted in
tests — view results hash-equal the DataFrame functions). At cluster scale
these would be defined once in the metastore over gold Delta tables.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from flinkrealtimedatawarehouse_spark.tables import load_table, register_views

# Each entry: view name -> SQL over the base-table views (and earlier ads_
# views — definition order matters only for readability; resolution is
# lazy). Kept as ANSI-ish Spark SQL mirroring the mapper queries.
SERVING_VIEWS: dict[str, str] = {
    # A10 (ProductStatsMapper.java:15-16) — per-day GMV; the mapper's
    # #{date} parameter becomes a WHERE on the view
    "ads_gmv_day": """
        SELECT date_format(o_orderdate, 'yyyyMMdd') AS dt,
               round(sum(o_totalprice), 2) AS gmv
        FROM orders GROUP BY 1
    """,
    # A7/O1 (ProductStatsMapper.java:21-41) — top-N by brand
    "ads_top_brand": """
        SELECT p_brand, round(sum(l_extendedprice), 2) AS order_amount
        FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand HAVING order_amount > 0
        ORDER BY order_amount DESC, p_brand LIMIT 10
    """,
    # A8/O2 (VisitorStatsMapper.java:22-25) — hour series w/ conditional agg
    "ads_hourly": """
        WITH vs AS (
          SELECT window(ts, '1 hour').start AS stt,
                 CASE WHEN event_type = 'signup' THEN '1' ELSE '0' END AS is_new,
                 count(DISTINCT user_id) AS uv_ct, count(*) AS pv_ct
          FROM events GROUP BY 1, 2
        )
        SELECT hour(stt) AS hr,
               sum(IF(is_new = '1', uv_ct, 0)) AS new_uv,
               sum(uv_ct) AS uv_ct, sum(pv_ct) AS pv_ct
        FROM vs GROUP BY hr ORDER BY hr
    """,
    # A9 (KeywordStatsMapper.java:15-20) — multiIf weighted scoring over
    # tokenized documents (F1 tokenizer as a SQL LATERAL VIEW)
    "ads_keyword_score": """
        WITH toks AS (
          SELECT source, word
          FROM documents
          LATERAL VIEW explode(
            filter(split(lower(text), '[^a-z0-9]+'), s -> length(s) > 0)
          ) t AS word
        ), k AS (
          SELECT word, source, count(*) AS ct FROM toks GROUP BY 1, 2
        )
        SELECT word AS keyword,
               sum(ct * CASE source WHEN 'src0' THEN 10 WHEN 'src1' THEN 3
                                    WHEN 'src2' THEN 2 WHEN 'src3' THEN 1
                                    ELSE 0 END) AS ct
        FROM k GROUP BY 1 ORDER BY ct DESC, keyword LIMIT 20
    """,
    # ProductStatsMapper.java:38-41 — spu top-N carries TWO measures
    # (sum(order_amount) AND sum(order_ct)); part plays the spu dim
    "ads_top_part": """
        SELECT p_partkey, round(sum(l_extendedprice), 2) AS order_amount,
               count(*) AS order_ct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_partkey HAVING order_amount > 0
        ORDER BY order_amount DESC, p_partkey LIMIT 10
    """,
    # VisitorStatsMapper.java:12-14 — new-vs-returning rollup: every
    # measure summed, grouped only by the is_new flag
    "ads_visitor_newflag": """
        SELECT CASE WHEN event_type = 'signup' THEN '1' ELSE '0' END AS is_new,
               count(DISTINCT user_id) AS uv_ct, count(*) AS pv_ct,
               round(sum(value), 2) AS value_sum
        FROM events GROUP BY 1
    """,
    # ProvinceStatsMapper.java:12-14 — province map widget: sum(order_amount)
    # by province for one day; the view exposes (day, province) and the
    # consumer filters the day like the mapper's #{date}
    "ads_province": """
        SELECT date_format(o_orderdate, 'yyyyMMdd') AS dt, n_name AS province_name,
               round(sum(o_totalprice), 2) AS order_amount
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
    """,
    # Rolling trend (beyond ref; ads.rolling_metrics twin): 7-day moving
    # average over the daily GMV series + running cumulative
    "ads_rolling_gmv": """
        WITH d AS (
          SELECT to_date(o_orderdate) AS dt,
                 datediff(to_date(o_orderdate), DATE '1970-01-01') AS dayn,
                 round(sum(o_totalprice), 2) AS amount
          FROM orders GROUP BY 1, 2
        )
        SELECT date_format(dt, 'yyyy-MM-dd') AS dt, amount,
               round(avg(amount) OVER (ORDER BY dayn
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS ma7,
               round(sum(amount) OVER (ORDER BY dayn
                     ROWS UNBOUNDED PRECEDING), 2) AS cume
        FROM d
    """,
    # Pivot matrix (beyond ref; ads.pivot_matrix twin): hour x event-type
    "ads_hour_matrix": """
        SELECT * FROM (
          SELECT hour(ts) AS hr, event_type FROM events
        ) PIVOT (
          count(*) FOR event_type IN ('click', 'view', 'purchase')
        )
    """,
}


def register_serving_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register the base tables + every ADS serving view; returns the view
    names. Idempotent (CREATE OR REPLACE)."""
    register_views(spark, sf_dir)
    for name, sql in SERVING_VIEWS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {sql}")
    return list(SERVING_VIEWS)


# --- J6: join avoidance via a pre-joined wide gold table -------------------
#
# The reference's DWS layer is wide BY DESIGN so the ADS mappers never join
# (README:404-410; ProductStatsMapper.java queries product_stats alone,
# never product x brand x date dims). The same trade here: pay the star
# join ONCE at build (streaming upkeep would run it through the K4 gold
# sink), then every dashboard query is a single-table scan -> one hash agg,
# no per-query shuffle of the dims. At 100 TB the wide table additionally
# partitions by order-date day, so the mappers' #{date} filters prune
# partitions instead of scanning history.

WIDE_PRODUCT_SQL = """
    SELECT l.l_orderkey, l.l_partkey, p.p_brand, l.l_extendedprice,
           date_format(o.o_orderdate, 'yyyyMMdd') AS dt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
"""

# Single-table mapper twins over the wide build: same answers as running
# the FROM-base formulation (asserted in tests), zero join nodes in the
# serving plan (plan-asserted).
WIDE_SERVING_VIEWS: dict[str, str] = {
    "ads_top_brand_wide": """
        SELECT p_brand, round(sum(l_extendedprice), 2) AS order_amount
        FROM product_wide GROUP BY p_brand HAVING order_amount > 0
        ORDER BY order_amount DESC, p_brand LIMIT 10
    """,
    "ads_top_part_wide": """
        SELECT l_partkey AS p_partkey,
               round(sum(l_extendedprice), 2) AS order_amount,
               count(*) AS order_ct
        FROM product_wide GROUP BY l_partkey HAVING order_amount > 0
        ORDER BY order_amount DESC, p_partkey LIMIT 10
    """,
    "ads_gmv_day_wide": """
        SELECT dt, round(sum(l_extendedprice), 2) AS gmv
        FROM product_wide GROUP BY dt
    """,
}


def build_wide_product(
    spark: SparkSession, sf_dir: str, path: str, partition_by_day: bool = False
) -> None:
    """Materialize the wide product gold table (the one join J6 pays).

    ``partition_by_day=True`` is the cluster layout (day partition pruning
    for the mappers' #{date} parameter); at test scale it would shatter
    tiny files, so it is opt-in.
    """
    register_views(spark, sf_dir)
    wide = spark.sql(WIDE_PRODUCT_SQL)
    writer = wide.write.mode("overwrite")
    if partition_by_day:
        writer = writer.partitionBy("dt")
    writer.parquet(path)


def register_wide_serving_views(spark: SparkSession, path: str) -> list[str]:
    """Register ``product_wide`` over a built wide table + the single-table
    ADS views. Idempotent (CREATE OR REPLACE)."""
    spark.read.parquet(path).createOrReplaceTempView("product_wide")
    for name, sql in WIDE_SERVING_VIEWS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {sql}")
    return list(WIDE_SERVING_VIEWS)


# --- J6 streaming upkeep: the wide gold table maintained continuously ------
#
# The reference never rebuilds its wide DWS table from scratch: ProductStats
# rows are aggregated in-stream and flushed to ClickHouse every 10 s at
# AGGREGATE grain keyed (window, sku_id) (rt/app/dws/ProductStatsApp.java:
# 393-401). The Spark twin: lineitem facts stream in micro-batches, each
# batch is enriched with the part dim (broadcast) and the order-date lookup,
# then folded ADDITIVELY into the wide gold table through the K4
# AdditiveGoldSink keyed on (dt, l_partkey, p_brand) — replay-safe
# (batch-id marker), restart-recoverable (versioned snapshot + committed
# marker). Row grain is NOT used because the synthetic lineitem has no
# unique key (even (l_orderkey, l_partkey, l_linenumber, l_suppkey) repeats
# at sf0.001) — and the reference's own wide table is aggregate-grain
# anyway; additive folding is the batching-invariant formulation.
#
# Scale: per batch the plan is broadcast-hash part join + keyed orders
# lookup (AQE broadcasts the small micro-batch side; at 100 TB both sides
# shuffle on the order key) + a partial agg that collapses the batch to
# |touched keys| rows before the full-outer merge with the running table.
# The running table is |days x parts x brands| — dimension-bounded, not
# fact-bounded.

WIDE_AGG_KEYS = ["dt", "l_partkey", "p_brand"]

# Single-table mapper twins over the LIVE (streaming-maintained,
# aggregate-grain) wide table. Same answers as the batch-built row-grain
# views and the normalized-base formulation (gate-asserted), still zero
# join nodes in the serving plan.
WIDE_LIVE_SERVING_VIEWS: dict[str, str] = {
    "ads_top_brand_wide_live": """
        SELECT p_brand, round(sum(order_amount), 2) AS order_amount
        FROM product_wide_live GROUP BY p_brand HAVING order_amount > 0
        ORDER BY order_amount DESC, p_brand LIMIT 10
    """,
    "ads_gmv_day_wide_live": """
        SELECT dt, round(sum(order_amount), 2) AS gmv
        FROM product_wide_live GROUP BY dt
    """,
}


def stage_wide_input(spark: SparkSession, sf_dir: str, n_batches: int = 4,
                     tag: str = "widegold") -> str:
    """Pre-stage the lineitem stream input for ``stream_wide_product_upkeep``
    so timed callers (bench serving tier) can exclude the one-off staging
    write from the measured streamed-build cost."""
    from flinkrealtimedatawarehouse_spark.streaming import runner

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    return runner.stage_stream_dir(li, "l_orderkey", n_batches, tag)


def stream_wide_product_upkeep(spark: SparkSession, sf_dir: str, out_dir: str,
                               n_batches: int = 4, tag: str = "widegold",
                               retain_versions: int | None = 64,
                               staged_dir: str | None = None):
    """Maintain the wide product gold table incrementally from a lineitem
    stream; returns the AdditiveGoldSink holding the running table.

    Each micro-batch: enrich (part broadcast + orders date lookup, INNER
    like WIDE_PRODUCT_SQL) -> fold additively into (dt, l_partkey,
    p_brand) running totals. The final table answers the same mapper
    queries as the batch ``build_wide_product`` output (hash-asserted in
    the a7_ads_product gate and tests).

    Point-in-time: the sink commits one snapshot version per applied
    batch, so ``sink.read_version(spark, b)`` is the wide table as of
    stream batch ``b`` — the same as-of contract as the streamed postings
    and IVF indexes; register it with ``register_wide_live_views`` for
    time-traveled serving views (pinned in
    tests/test_serving.py::test_wide_live_answers_as_of_any_batch).

    ``retain_versions`` (default 64) is this sink's compaction policy:
    each version is a COMPLETE |days x parts x brands| table (reads never
    touch more than one version dir, so there is no read-latency decay to
    compact away — unlike the append-only postings/IVF corpora), but a
    long stream would hoard O(commits x table) storage; auto-vacuum keeps
    the as-of horizon a sliding window of the newest N batches. None
    retains everything."""
    from flinkrealtimedatawarehouse_spark.streaming import runner, sinks

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.date_format("o_orderdate", "yyyyMMdd").alias("dt")
    )
    in_dir = staged_dir or runner.stage_stream_dir(li, "l_orderkey", n_batches, tag)
    sdf = runner.parquet_stream(spark, in_dir, li.schema)
    sink = sinks.AdditiveGoldSink(
        out_dir,
        keys=WIDE_AGG_KEYS,
        measures={
            "order_amount": ("l_extendedprice", "sum"),
            "order_ct": ("l_extendedprice", "count"),
        },
        retain_versions=retain_versions,
    )

    def _enrich_and_fold(batch, bid):
        # Range-prune the orders lookup side to the batch's own key span
        # (round 14, guide §3.2/§8): micro-batches are time/key-local
        # (the staged feed slices by l_orderkey; a real CDC feed is
        # time-ordered), so o_orderkey BETWEEN min/max of the batch is a
        # pushed-down parquet predicate that skips the row groups no row
        # of this batch can match — the join is INNER on equality, so
        # rows outside the batch's span can never survive it and the
        # filter is result-identical. The bounds pass reads ONE column
        # of the batch; on an arbitrary-keyed (non-local) feed the
        # bounds cover everything and the filter is harmless. Without
        # this, every micro-batch re-scanned and re-shuffled the FULL
        # orders side (measured at sf1: ~3 s of the ~7 s per batch).
        lo, hi = batch.agg(
            F.min("l_orderkey"), F.max("l_orderkey")
        ).first()
        odim = orders if lo is None else orders.filter(
            F.col("o_orderkey").between(F.lit(lo), F.lit(hi))
        )
        # A micro-batch arrives as ONE single-row-group file — unsplittable,
        # so without this the whole enrich+partial-agg map side runs in one
        # task (measured at sf1: ~2.5 s single-threaded per batch while 31
        # cores idle). Hash-repartitioning the batch on the join key costs
        # one small exchange of the raw batch (~14 MB) and fans the joins +
        # partial aggregation across the cluster; on a real Kafka feed the
        # source is topic-partitioned and this exchange does not exist.
        batch = batch.repartition(F.col("l_orderkey"))
        enriched = (
            batch.join(F.broadcast(part), batch["l_partkey"] == part["p_partkey"], "inner")
            .join(odim, batch["l_orderkey"] == odim["o_orderkey"], "inner")
        )
        sink.write_batch(enriched, bid)

    runner.run_foreach_batch(sdf, _enrich_and_fold, tag)
    return sink


def register_wide_live_views(spark: SparkSession, wide_live) -> list[str]:
    """Register ``product_wide_live`` over the streaming-maintained wide
    table + its single-table ADS views. Idempotent (CREATE OR REPLACE)."""
    wide_live.createOrReplaceTempView("product_wide_live")
    for name, sql in WIDE_LIVE_SERVING_VIEWS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {sql}")
    return list(WIDE_LIVE_SERVING_VIEWS)
