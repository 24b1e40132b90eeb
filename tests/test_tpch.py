"""TPC-H classic shapes (Q1/Q3/Q5/Q18 adapted) — beyond-ref warehouse
analytics. Correctness is gated by the a12_rollup_tpch DuckDB oracle; these
tests pin the invariants the oracle's value-hash can't localize: per-query
internal consistency, top-N ordering, and the pre-aggregated HAVING shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flinkrealtimedatawarehouse_spark.benchqueries import tpch
from flinkrealtimedatawarehouse_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_q1_totals_reconcile_with_raw_scan(spark):
    out = tpch.q_tpch1(spark, SF)
    rows = out.collect()
    assert len(rows) >= 2  # at least two (returnflag, linestatus) cells
    li = load_table(spark, SF, "lineitem").filter(F.col("l_shipdate") <= "2001-09-01")
    total = li.count()
    assert sum(r["count_order"] for r in rows) == total
    for r in rows:
        # avg_qty must equal sum_qty / count_order within rounding
        assert abs(r["avg_qty"] - r["sum_qty"] / r["count_order"]) < 1e-3
        # discounting can only lower revenue
        assert r["sum_disc_price"] <= r["sum_base_price"] + 1e-6


def test_q3_topn_is_sorted_and_bounded(spark):
    rows = tpch.q_tpch3(spark, SF).collect()
    assert 0 < len(rows) <= 10
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    # deterministic tiebreak: equal revenues must be orderkey-ascending
    for a, b in zip(rows, rows[1:]):
        if a["revenue"] == b["revenue"]:
            assert a["o_orderkey"] < b["o_orderkey"]


def test_q5_nations_belong_to_asia(spark):
    rows = tpch.q_tpch5(spark, SF).collect()
    n = load_table(spark, SF, "nation")
    r = load_table(spark, SF, "region").filter(F.col("r_name") == "ASIA")
    asia = {
        x["n_name"]
        for x in n.join(r, n["n_regionkey"] == r["r_regionkey"]).select("n_name").collect()
    }
    assert rows  # ASIA has revenue in the date window
    assert {x["n_name"] for x in rows} <= asia
    assert all(x["revenue"] > 0 for x in rows)


def test_q18_threshold_and_join_grain(spark):
    # Lower threshold locally so sf0.001 produces rows.
    li = load_table(spark, SF, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    thresh = per_order.agg(F.expr("percentile(q, 0.99)")).first()[0]
    big = per_order.filter(F.col("q") > thresh).count()
    assert big > 0

    rows = tpch.q_tpch18(spark, SF).collect()
    # every returned order really exceeds 300 total quantity
    over300 = {r["l_orderkey"] for r in per_order.filter(F.col("q") > 300).collect()}
    assert {r["o_orderkey"] for r in rows} == over300
    # one output row per qualifying order (join did not fan out)
    assert len(rows) == len(over300)


def test_a12c_gate_branches_all_present(spark):
    got = {r["branch"] for r in tpch.q_a12c(spark, SF).select("branch").distinct().collect()}
    # q18's fixed >300 threshold may legitimately be empty at sf0.001;
    # every other branch must be populated.
    assert {"rollup", "tpch1", "tpch3", "tpch5", "tpch13", "tpch17"} <= got
    # q15 (single max supplier) and q22 (rich no-order customers in 7
    # sampled codes) can legitimately be empty at the 150-customer
    # sf0.001; the sf0.01 driver gate hashes them populated
    if not SF.endswith("sf0.001"):
        assert {"tpch15", "tpch22"} <= got
