"""SQL serving surface: every ads_* view must agree with its DataFrame
twin (two APIs, one answer — SURVEY.md §3.3), and versioned snapshots
support time travel."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_serving_views_match_dataframe_twins(spark):
    from flinkrealtimedatawarehouse_spark import serving
    from flinkrealtimedatawarehouse_spark.benchqueries import warehouse

    names = serving.register_serving_views(spark, SF)
    assert set(names) == set(serving.SERVING_VIEWS)

    # A7 top-N by brand
    got = _rows(spark.sql("SELECT * FROM ads_top_brand"), ["p_brand", "order_amount"])
    want = _rows(warehouse.q_a7(spark, SF), ["p_brand", "order_amount"])
    assert got == want

    # A8 hour series
    got = _rows(spark.sql("SELECT * FROM ads_hourly"), ["hr", "new_uv", "uv_ct", "pv_ct"])
    want = _rows(warehouse.q_a8(spark, SF), ["hr", "new_uv", "uv_ct", "pv_ct"])
    assert got == want

    # rolling trend: view (dt, amount, ma7, cume) == q_a8r (k, v1, v2, v3)
    got = _rows(spark.sql("SELECT * FROM ads_rolling_gmv"), ["dt", "amount", "ma7", "cume"])
    want = _rows(warehouse.q_a8r(spark, SF), ["k", "v1", "v2", "v3"])
    assert got == want

    # pivot matrix: PIVOT view vs pivot_matrix twin (null == no rows)
    got = _rows(spark.sql("SELECT * FROM ads_hour_matrix"), ["hr", "click", "view", "purchase"])
    want = _rows(
        warehouse.q_a8p(spark, SF).selectExpr(
            "cast(k as int) hr", "cast(v1 as long) click",
            "cast(v2 as long) view", "cast(v3 as long) purchase"
        ),
        ["hr", "click", "view", "purchase"],
    )
    got = [(h, c or 0, v or 0, p or 0) for h, c, v, p in got]
    assert got == want

    # GMV day view answers the mapper's parameterized query
    one = spark.sql("SELECT gmv FROM ads_gmv_day WHERE dt = '19960917'").collect()
    assert len(one) <= 1


def test_snapshot_time_travel(spark, tmp_path):
    from flinkrealtimedatawarehouse_spark.streaming import sinks

    base = spark.createDataFrame([(1, 10.0, 0)], "pk long, val double, v int")
    sink = sinks.SnapshotMergeSink(str(tmp_path / "tt"), "pk", "v")
    sink.init(base)
    sink.write_batch(spark.createDataFrame([(1, 11.0, 1)], base.schema), 0)
    sink.write_batch(spark.createDataFrame([(2, 20.0, 2)], base.schema), 1)

    assert sink.versions() == [0, 1, 2]
    v0 = {r.pk: r.val for r in sink.read_version(spark, 0).collect()}
    v1 = {r.pk: r.val for r in sink.read_version(spark, 1).collect()}
    v2 = {r.pk: r.val for r in sink.read_version(spark, 2).collect()}
    assert v0 == {1: 10.0}
    assert v1 == {1: 11.0}
    assert v2 == {1: 11.0, 2: 20.0}

    import pytest

    with pytest.raises(ValueError):
        sink.read_version(spark, 3)


def test_province_view_matches_dataframe_star_join(spark):
    """ProvinceStatsMapper.java:12-14 — the province/day serving grid must
    equal the equivalent DataFrame star join."""
    from pyspark.sql import functions as F

    from flinkrealtimedatawarehouse_spark import serving
    from flinkrealtimedatawarehouse_spark.tables import load_table

    serving.register_serving_views(spark, SF)
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    n = load_table(spark, SF, "nation")
    want = _rows(
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.date_format("o_orderdate", "yyyyMMdd").alias("dt"),
            F.col("n_name").alias("province_name"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("order_amount")),
        ["dt", "province_name", "order_amount"],
    )
    got = _rows(spark.sql("SELECT * FROM ads_province"), ["dt", "province_name", "order_amount"])
    assert got == want and len(got) > 0


def test_two_measure_topn_and_newflag_views(spark):
    """ProductStatsMapper.java:38-41 (two-measure spu top-N) and
    VisitorStatsMapper.java:12-14 (new-vs-returning rollup) as views."""
    from flinkrealtimedatawarehouse_spark import serving

    serving.register_serving_views(spark, SF)
    top = spark.sql("SELECT * FROM ads_top_part").collect()
    assert len(top) == 10
    amounts = [r.order_amount for r in top]
    assert amounts == sorted(amounts, reverse=True)
    assert all(r.order_ct >= 1 for r in top)

    flags = {r.is_new: (r.uv_ct, r.pv_ct) for r in spark.sql(
        "SELECT * FROM ads_visitor_newflag").collect()}
    assert set(flags) == {"0", "1"}
    # cross-check against a direct aggregate
    from pyspark.sql import functions as F
    from flinkrealtimedatawarehouse_spark.tables import load_table

    ev = load_table(spark, SF, "events")
    want_pv = ev.count()
    assert flags["0"][1] + flags["1"][1] == want_pv


def test_keyword_score_view_matches_dataframe_twin(spark):
    from flinkrealtimedatawarehouse_spark import serving
    from flinkrealtimedatawarehouse_spark.benchqueries import warehouse

    serving.register_serving_views(spark, SF)
    got = _rows(spark.sql("SELECT * FROM ads_keyword_score"), ["keyword", "ct"])
    want = _rows(warehouse.q_a9(spark, SF), ["keyword", "ct"])
    assert got == want and len(got) == 20


def test_wide_gold_serving_avoids_joins(spark, tmp_path):
    """J6 (README:404-410): build the wide gold table once (the only
    join), then every mapper twin over it plans ZERO join nodes while
    returning the same rows as the normalized join-per-query formulation
    — the reference's DWS-wide / ADS-single-table contract."""
    from flinkrealtimedatawarehouse_spark import serving

    path = str(tmp_path / "product_wide")
    serving.build_wide_product(spark, SF, path)
    names = serving.register_wide_serving_views(spark, path)
    assert set(names) == set(serving.WIDE_SERVING_VIEWS)

    twins = {
        "ads_top_brand_wide": f"""
            SELECT p_brand, round(sum(l_extendedprice), 2) AS order_amount
            FROM ({serving.WIDE_PRODUCT_SQL}) GROUP BY p_brand
            HAVING order_amount > 0
            ORDER BY order_amount DESC, p_brand LIMIT 10
        """,
        "ads_top_part_wide": f"""
            SELECT l_partkey AS p_partkey,
                   round(sum(l_extendedprice), 2) AS order_amount,
                   count(*) AS order_ct
            FROM ({serving.WIDE_PRODUCT_SQL}) GROUP BY l_partkey
            HAVING order_amount > 0
            ORDER BY order_amount DESC, p_partkey LIMIT 10
        """,
        "ads_gmv_day_wide": f"""
            SELECT dt, round(sum(l_extendedprice), 2) AS gmv
            FROM ({serving.WIDE_PRODUCT_SQL}) GROUP BY dt
        """,
    }
    for view, twin_sql in twins.items():
        wide_df = spark.sql(f"SELECT * FROM {view}")
        plan = wide_df._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan, f"{view} serving plan re-joins:\n{plan}"
        twin_df = spark.sql(twin_sql)
        twin_plan = twin_df._jdf.queryExecution().executedPlan().toString()
        assert "Join" in twin_plan  # the per-query cost the wide build avoids
        cols = wide_df.columns
        assert _rows(wide_df, cols) == _rows(twin_df, cols), view


def test_wide_cache_invalidated_when_scratch_removed(spark):
    """q_a7c memoizes the built wide table per (process, sf dir); if the
    scratch path disappears mid-process the memo must rebuild, not
    register views over a missing path."""
    import shutil

    from flinkrealtimedatawarehouse_spark.benchqueries import warehouse

    first = warehouse.q_a7c(spark, SF)
    n_first = first.count()
    cached = warehouse._WIDE_BUILT[SF]
    shutil.rmtree(cached)
    second = warehouse.q_a7c(spark, SF)
    assert second.count() == n_first
    import os

    assert os.path.isdir(warehouse._WIDE_BUILT[SF])


def test_streaming_wide_upkeep_matches_batch_build(spark, tmp_path):
    """J6 streaming upkeep: the AdditiveGoldSink-maintained wide table
    (lineitem stream -> per-batch enrich -> additive fold) must answer the
    mapper queries identically to the batch-built wide table, and its
    serving plans must stay join-free."""
    from flinkrealtimedatawarehouse_spark import serving
    from flinkrealtimedatawarehouse_spark.streaming.sinks import AdditiveGoldSink

    live = serving.stream_wide_product_upkeep(
        spark, SF, str(tmp_path / "wide_live"), n_batches=3, tag="widetest"
    )
    serving.register_wide_live_views(spark, live.current(spark))

    serving.build_wide_product(spark, SF, str(tmp_path / "wide_batch"))
    serving.register_wide_serving_views(spark, str(tmp_path / "wide_batch"))

    for live_view, batch_view, cols in [
        ("ads_top_brand_wide_live", "ads_top_brand_wide", ["p_brand", "order_amount"]),
        ("ads_gmv_day_wide_live", "ads_gmv_day_wide", ["dt", "gmv"]),
    ]:
        live_df = spark.sql(f"SELECT * FROM {live_view}")
        plan = live_df._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan, f"{live_view} serving plan re-joins:\n{plan}"
        assert _rows(live_df, cols) == _rows(spark.sql(f"SELECT * FROM {batch_view}"), cols)

    # restart recovery: a fresh sink object over the same dir resumes the
    # committed running table (no re-streaming)
    resumed = AdditiveGoldSink(
        str(tmp_path / "wide_live"), keys=serving.WIDE_AGG_KEYS,
        measures={"order_amount": ("l_extendedprice", "sum"),
                  "order_ct": ("l_extendedprice", "count")},
    )
    cols = serving.WIDE_AGG_KEYS + ["order_amount", "order_ct"]
    assert _rows(resumed.current(spark), cols) == _rows(live.current(spark), cols)


def test_wide_live_answers_as_of_any_batch(spark, tmp_path):
    """J6 point-in-time serving: snapshot version b of the
    streaming-maintained wide table equals a direct additive aggregation
    over the lineitem prefix that had arrived by batch b — one snapshot
    version per applied batch, the same as-of contract the streamed
    postings and IVF indexes expose — and the live serving views compose
    with time travel (register over read_version(b))."""
    from pyspark.sql import functions as F

    from flinkrealtimedatawarehouse_spark import serving
    from flinkrealtimedatawarehouse_spark.streaming.sinks import AdditiveGoldSink
    from flinkrealtimedatawarehouse_spark.tables import load_table

    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    part = load_table(spark, SF, "part").select("p_partkey", "p_brand")
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", F.date_format("o_orderdate", "yyyyMMdd").alias("dt")
    )

    def enrich(batch):
        # same INNER enrich as serving.stream_wide_product_upkeep
        return (
            batch.join(F.broadcast(part), batch["l_partkey"] == part["p_partkey"])
            .join(orders, batch["l_orderkey"] == orders["o_orderkey"])
        )

    cut = li.approxQuantile("l_orderkey", [1 / 3, 2 / 3], 0.001)
    slices = [
        li.filter(F.col("l_orderkey") <= cut[0]),
        li.filter((F.col("l_orderkey") > cut[0]) & (F.col("l_orderkey") <= cut[1])),
        li.filter(F.col("l_orderkey") > cut[1]),
    ]
    sink = AdditiveGoldSink(
        str(tmp_path / "wlive"), keys=serving.WIDE_AGG_KEYS,
        measures={"order_amount": ("l_extendedprice", "sum"),
                  "order_ct": ("l_extendedprice", "count")},
    )
    for bid, sl in enumerate(slices):
        sink.write_batch(enrich(sl), bid)

    cols = serving.WIDE_AGG_KEYS + ["order_amount", "order_ct"]
    prefix = None
    for b, sl in enumerate(slices):
        prefix = sl if prefix is None else prefix.unionByName(sl)
        want = _rows(
            enrich(prefix).groupBy(*serving.WIDE_AGG_KEYS).agg(
                F.sum("l_extendedprice").cast("double").alias("order_amount"),
                F.count(F.lit(1)).cast("double").alias("order_ct"),
            ),
            cols,
        )
        got = _rows(sink.read_version(spark, b), cols)
        assert got == want, f"as-of batch {b} diverged"

    # the live views time-travel too: registered over version 0 they
    # answer from the first batch's totals only
    serving.register_wide_live_views(spark, sink.read_version(spark, 0))
    v0_brand = _rows(spark.sql("SELECT * FROM ads_top_brand_wide_live"),
                     ["p_brand", "order_amount"])
    direct0 = enrich(slices[0]).groupBy(*serving.WIDE_AGG_KEYS).agg(
        F.sum("l_extendedprice").cast("double").alias("order_amount"),
        F.count(F.lit(1)).cast("double").alias("order_ct"),
    )
    serving.register_wide_live_views(spark, direct0)
    want0 = _rows(spark.sql("SELECT * FROM ads_top_brand_wide_live"),
                  ["p_brand", "order_amount"])
    assert v0_brand == want0


def test_wide_upkeep_empty_batch_and_pruned_orders(spark, tmp_path):
    """Round-14 upkeep optimization edges: the per-batch orders lookup is
    range-pruned to the batch's min/max l_orderkey. Pin (a) an EMPTY
    micro-batch (bounds come back NULL -> unfiltered orders path) commits
    a version and leaves the totals unchanged, and (b) the final table
    still equals the batch-built aggregation under the pruned path."""
    import glob
    import os

    from pyspark.sql import functions as F

    from flinkrealtimedatawarehouse_spark import serving
    from flinkrealtimedatawarehouse_spark.streaming import runner
    from flinkrealtimedatawarehouse_spark.tables import load_table

    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    staged = serving.stage_wide_input(spark, SF, n_batches=2, tag="widemptyt")
    # append an EMPTY third batch file (schema'd, newest mtime)
    tmp = runner.scratch_dir("widempty_sent")
    li.limit(0).coalesce(1).write.mode("overwrite").parquet(tmp)
    src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dst = os.path.join(staged, "zzz-empty.parquet")
    import shutil as _sh
    _sh.copyfile(src, dst)
    newest = max(os.path.getmtime(os.path.join(staged, f))
                 for f in os.listdir(staged) if f.endswith(".parquet"))
    os.utime(dst, (newest + 10, newest + 10))

    sink = serving.stream_wide_product_upkeep(
        spark, SF, str(tmp_path / "wlive_empty"), n_batches=3,
        tag="widemptyt", staged_dir=staged
    )
    # three batches committed (2 real + 1 empty), empty batch = no-op fold
    assert sink.last_bid == 2
    cols = serving.WIDE_AGG_KEYS + ["order_amount", "order_ct"]
    assert _rows(sink.read_version(spark, 2), cols) == _rows(
        sink.read_version(spark, 1), cols
    )
    # equality with the direct batch aggregation (pruned path end-to-end)
    part = load_table(spark, SF, "part").select("p_partkey", "p_brand")
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", F.date_format("o_orderdate", "yyyyMMdd").alias("dt")
    )
    want = _rows(
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(*serving.WIDE_AGG_KEYS)
        .agg(F.sum("l_extendedprice").cast("double").alias("order_amount"),
             F.count(F.lit(1)).cast("double").alias("order_ct")),
        cols,
    )
    assert _rows(sink.current(spark), cols) == want
