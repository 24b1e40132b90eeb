"""End-to-end DB pipeline on the REAL CDC envelope shape (schemas.py):
raw Maxwell/Debezium-style JSON -> envelope parse (S3) -> delete filter
(P2) -> config-table routing with column pruning (P4/P5/J5) -> dim MERGE
upsert (K3) on the hbase branch + interval join (J1) on the kafka branch
-> dim enrichment (J3) — the BaseDBApp/OrderWideApp path
(rt/app/dwd/BaseDBApp.java:46-133, rt/app/dwd/OrderWideApp.java:80-88)
on its native structure, with hand-computed expectations."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from flinkrealtimedatawarehouse_spark.operators import logsplit, merge, routing
from flinkrealtimedatawarehouse_spark.operators.joins import dim_enrich, interval_join
from flinkrealtimedatawarehouse_spark.streaming.sources import parse_cdc_envelope


def _cdc(ver, table, typ, after):
    return (ver, json.dumps({
        "database": "gmall", "tableName": table, "type": typ,
        "before": {}, "after": {k: str(v) for k, v in after.items()},
    }))


def _raw_changes(spark):
    rows = [
        _cdc(1, "base_province", "insert", {"id": 1, "name": "beijing", "area_code": "110"}),
        _cdc(2, "base_province", "update", {"id": 1, "name": "beijing_renamed", "area_code": "110"}),
        _cdc(3, "order_info", "create", {"id": 101, "province_id": 1, "total_amount": 50.0,
                                         "create_time": "2024-01-01 10:00:00"}),
        _cdc(4, "order_info", "insert", {"id": 102, "province_id": 2, "total_amount": 30.0,
                                         "create_time": "2024-01-01 10:00:10"}),
        _cdc(5, "order_detail", "insert", {"id": 1001, "order_id": 101, "sku_id": 9,
                                           "create_time": "2024-01-01 10:00:03"}),
        _cdc(6, "order_detail", "insert", {"id": 1002, "order_id": 101, "sku_id": 9,
                                           "create_time": "2024-01-01 10:00:20"}),  # outside +-5s
        _cdc(7, "order_detail", "insert", {"id": 1003, "order_id": 102, "sku_id": 8,
                                           "create_time": "2024-01-01 10:00:08"}),
        _cdc(8, "user_info", "insert", {"id": 7}),            # no config row -> discarded
        _cdc(9, "order_info", "delete", {"id": 101}),         # P2 drops deletes
    ]
    return spark.createDataFrame(rows, "ver long, value string")


def _config(spark):
    rows = [
        ("base_province", "insert", "hbase", "dim_base_province", "id,name,area_code"),
        ("base_province", "update", "hbase", "dim_base_province", "id,name,area_code"),
        ("order_info", "insert", "kafka", "dwd_order_info", "id,province_id,total_amount,create_time"),
        ("order_detail", "insert", "kafka", "dwd_order_detail", "id,order_id,sku_id,create_time"),
    ]
    return spark.createDataFrame(
        rows, "source_table string, operate_type string, sink_type string, "
              "sink_table string, sink_columns string"
    )


def test_gmall_db_pipeline_end_to_end(spark):
    env = parse_cdc_envelope(_raw_changes(spark))
    kept = logsplit.delete_filter(env)
    assert kept.count() == 8  # the delete row is gone

    routed = routing.route_with_config(kept, _config(spark))
    # user_info had no config -> dropped by the inner join (the reference's
    # "no key in state -> discard", TableProcessFunction.java:153-155);
    # `create` was renamed `insert` by the envelope parse so it routes.
    assert routed.count() == 7

    # pruning: only sink_columns survive in after_pruned
    prov_rows = routed.filter(F.col("sink_table") == "dim_base_province")
    assert all(set(r["after_pruned"].keys()) <= {"id", "name", "area_code"}
               for r in prov_rows.collect())

    # --- hbase branch: MERGE into the dim snapshot (K3) -------------------
    dim_updates = prov_rows.select(
        F.col("after_pruned")["id"].cast("long").alias("id"),
        F.col("after_pruned")["name"].alias("name"),
        F.col("ver"),
    )
    snapshot = spark.createDataFrame(
        [(1, "beijing_stale", 0), (3, "shanghai", 0)], "id long, name string, ver long"
    )
    dim = merge.upsert_latest(snapshot, dim_updates, "id", "ver")
    got = {r["id"]: r["name"] for r in dim.collect()}
    assert got == {1: "beijing_renamed", 3: "shanghai"}  # newest ver wins, untouched pk survives

    # --- kafka branch: order ⋈ detail interval join (J1) ------------------
    def fact(sink_table, fields):
        d = routed.filter(F.col("sink_table") == sink_table)
        return d.select(
            *[F.col("after_pruned")[k].cast(t).alias(a) for k, t, a in fields]
        )

    orders = fact("dwd_order_info", [
        ("id", "long", "order_id"), ("province_id", "long", "province_id"),
        ("total_amount", "double", "total_amount"), ("create_time", "timestamp", "o_time"),
    ])
    details = fact("dwd_order_detail", [
        ("id", "long", "detail_id"), ("order_id", "long", "d_order_id"),
        ("sku_id", "long", "sku_id"), ("create_time", "timestamp", "d_time"),
    ])
    wide = interval_join(
        orders, details, ("order_id", "d_order_id"), ("o_time", "d_time"),
        "'-5' SECOND", "'5' SECOND",
    )
    pairs = {(r["order_id"], r["detail_id"]) for r in wide.collect()}
    assert pairs == {(101, 1001), (102, 1003)}  # 1002 is +20s away -> excluded

    # --- J3: enrich with the merged dim (left-outer, missing dim survives)
    enriched = dim_enrich(
        wide,
        [(dim.withColumnRenamed("id", "province_id").withColumnRenamed("name", "province_name"),
          "province_id", ["province_id", "province_name"])],
    )
    by_order = {r["order_id"]: r["province_name"] for r in enriched.collect()}
    assert by_order[101] == "beijing_renamed"   # sees the post-MERGE dim
    assert by_order[102] is None                # missing dim -> row survives (left join)
