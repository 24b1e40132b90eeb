"""End-to-end log pipeline on the REAL gmall log shape (schemas.py):
raw nested JSON -> parse-or-dirty (P1) -> is_new correction (A6) ->
3-way split with displays explode (P3) — the BaseLogApp path
(rt/app/dwd/BaseLogApp.java:46-144) on its native structure, not the
testdata analog."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from flinkrealtimedatawarehouse_spark.operators import logsplit
from flinkrealtimedatawarehouse_spark.schemas import LOG_EVENT_SCHEMA


def _raw_logs(spark):
    def page(mid, ts, page_id, last, is_new, displays=None):
        e = {
            "common": {"mid": mid, "is_new": is_new, "ar": "110000", "ch": "app", "vc": "v1"},
            "page": {"page_id": page_id, "last_page_id": last, "during_time": 1000},
            "ts": ts,
        }
        if displays:
            e["displays"] = [{"item": d, "item_type": "sku_id", "order": i + 1} for i, d in enumerate(displays)]
        return json.dumps(e)

    def start(mid, ts):
        return json.dumps({
            "common": {"mid": mid, "is_new": "1"},
            "start": {"entry": "icon", "loading_time": 1200},
            "ts": ts,
        })

    rows = [
        (start("m1", 1000),),
        (page("m1", 2000, "home", None, "1", displays=["sku1", "sku2"]),),
        (page("m1", 3000, "good_detail", "home", "1"),),        # later '1' -> corrected to '0'
        (page("m2", 1500, "home", None, "0"),),                  # logged '0' stays '0'
        ("{broken json",),                                        # dirty
    ]
    return spark.createDataFrame(rows, "value string")


def test_gmall_log_pipeline_end_to_end(spark):
    raw = _raw_logs(spark)
    clean, dirty = logsplit.parse_or_dirty(raw, "value", LOG_EVENT_SCHEMA)
    assert dirty.count() == 1 and clean.count() == 4

    # A6 on the real key (common.mid) and epoch-ms ts
    flat = clean.select(
        F.col("common.mid").alias("mid"),
        F.col("common.is_new").alias("is_new"),
        (F.col("ts") / 1000).cast("timestamp").alias("ets"),
        "page", "start", "displays", "value",
    )
    corrected = logsplit.correct_is_new(flat, "mid", "ets", "is_new")
    got = {(r.mid, r.ets.timestamp()): r.is_new_corrected for r in corrected.collect()}
    assert got[("m1", 1.0)] == "1"     # first '1' of m1 keeps it
    assert got[("m1", 2.0)] == "0"     # later '1' rewritten
    assert got[("m1", 3.0)] == "0"
    assert got[("m2", 1.5)] == "0"     # logged '0' untouched

    # P3 on the real routing key (start presence) + displays explode
    start_s, page_s, display_s = logsplit.three_way_split(corrected, F.col("start"))
    assert start_s.count() == 1
    assert page_s.count() == 3
    d = display_s.select("mid", "page.page_id", "display.item", "display.order").collect()
    assert {(r.item, r.order) for r in d} == {("sku1", 1), ("sku2", 2)}
    assert all(r.page_id == "home" for r in d)  # page_id injected per display row


def test_visitor_stats_native_keys_union(spark):
    """U1/A1 on the reference's ACTUAL key tuple (ar, ch, is_new, vc) and
    measure set pv/uv/sv/uj/dur (VisitorStatsApp.java:60-126, 133-188):
    three aligned streams union, then one keyed tumble-sum."""
    from datetime import datetime

    from flinkrealtimedatawarehouse_spark.operators import unions

    def ev(ar, ch, vc, is_new, sec, dur, entry):
        return (ar, ch, vc, is_new, datetime(2024, 1, 1, 0, 0, sec), float(dur), entry)

    # mid-less simplification: pv rows; uv = first per key-day; uj = entries
    rows = [
        ev("110", "app", "v1", "1", 1, 1000, 1),
        ev("110", "app", "v1", "1", 5, 2000, 0),
        ev("130", "web", "v2", "0", 9, 500, 1),
    ]
    pv = spark.createDataFrame(
        rows, "ar string, ch string, vc string, is_new string, ts timestamp, dur double, entry int"
    )
    uv = pv.filter("entry = 1")          # stand-in uv stream
    uj = pv.filter("entry = 1")          # stand-in bounce stream

    keys = ["ar", "ch", "vc", "is_new"]
    unioned = unions.align_union(
        [
            (pv, {"pv_ct": F.lit(1), "dur_sum": F.col("dur")}),
            (uv, {"uv_ct": F.lit(1)}),
            (uj, {"sv_ct": F.lit(1), "uj_ct": F.lit(1)}),
        ],
        keys, "ts", ["pv_ct", "uv_ct", "sv_ct", "uj_ct", "dur_sum"],
    )
    out = unions.tumble_sum(unioned, keys, "ts", ["pv_ct", "uv_ct", "sv_ct", "uj_ct", "dur_sum"], "10 seconds")
    got = {(r.ar, r.ch, r.vc, r.is_new): (r.pv_ct, r.uv_ct, r.sv_ct, r.uj_ct, r.dur_sum)
           for r in out.collect()}
    assert got[("110", "app", "v1", "1")] == (2.0, 1.0, 1.0, 1.0, 3000.0)
    assert got[("130", "web", "v2", "0")] == (1.0, 1.0, 1.0, 1.0, 500.0)


def test_log_split_lands_in_canonical_layer_tables(spark, tmp_path):
    """The BaseLogApp multi-destination write, end to end: the 3-way
    split flows through one multi_sink into the CANONICAL silver table
    names (layers.py) — producers and this consumer import the same
    constants, the mismatch class the reference suffers from
    (dwd_order_wide written, dwm_order_wide read) cannot arise."""
    from flinkrealtimedatawarehouse_spark import layers
    from flinkrealtimedatawarehouse_spark.streaming import sinks

    raw = _raw_logs(spark)
    clean, _dirty = logsplit.parse_or_dirty(raw, "value", LOG_EVENT_SCHEMA)
    flat = clean.select(
        F.col("common.mid").alias("mid"), "page", "start", "displays"
    )
    out = str(tmp_path / "silver")
    writer = sinks.multi_sink(
        {
            layers.DWD_START_LOG: lambda b: logsplit.three_way_split(b, F.col("start"))[0]
                .select("mid", "start.entry"),
            layers.DWD_PAGE_LOG: lambda b: logsplit.three_way_split(b, F.col("start"))[1]
                .select("mid", "page.page_id"),
            layers.DWD_DISPLAY_LOG: lambda b: logsplit.three_way_split(b, F.col("start"))[2]
                .select("mid", "display.item"),
        },
        out,
    )
    writer(flat, 0)
    # consumer side reads THROUGH the same constants
    assert spark.read.parquet(f"{out}/{layers.DWD_START_LOG}").count() == 1
    assert spark.read.parquet(f"{out}/{layers.DWD_PAGE_LOG}").count() == 3
    assert spark.read.parquet(f"{out}/{layers.DWD_DISPLAY_LOG}").count() == 2
