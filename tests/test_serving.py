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
