"""Boundary-case unit tests per SURVEY.md §5: interval-join bounds, bounce
at exactly the gap, is_new state semantics, dedup determinism, MERGE."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from flinkrealtimedatawarehouse_spark.operators import ads, bounce, dedup, joins, logsplit, merge, sessions


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


# --- W1 bounce: reference CEP semantics (UserJumpDetailApp.java:60-108) ----

def _bounce_rows(spark, events):
    df = spark.createDataFrame(events, "mid string, ts timestamp, page string, eid int")
    marked = bounce.mark_bounces(
        df, "mid", "ts", F.col("page") == "entry", gap_seconds=10, tiebreak="eid"
    )
    return {r.eid: r.is_bounce for r in marked.collect()}


def test_bounce_match_case_is_jump(spark):
    # entry followed by another entry within 10 s => CEP MATCH => first emitted
    out = _bounce_rows(spark, [
        ("m", ts("2024-01-01 00:00:00"), "entry", 1),
        ("m", ts("2024-01-01 00:00:03"), "entry", 2),
        ("m", ts("2024-01-01 00:00:20"), "entry", 3),
    ])
    assert out[1] == 1  # match case: jump
    assert out[2] == 1  # next entry 17s away: timeout: jump
    assert out[3] == 1  # no next: timeout: jump


def test_bounce_continuation_within_gap_kills_match(spark):
    # entry -> non-entry page at +2 s: strict `next` fails, no timeout => NOT a jump
    out = _bounce_rows(spark, [
        ("m", ts("2024-01-01 00:00:00"), "entry", 1),
        ("m", ts("2024-01-01 00:00:02"), "page", 2),
        ("m", ts("2024-01-01 00:00:15"), "entry", 3),
    ])
    assert out[1] == 0
    assert out[3] == 1


def test_bounce_continuation_after_gap_is_jump(spark):
    # next event is a continuation but arrives at +12 s: timeout already fired
    out = _bounce_rows(spark, [
        ("m", ts("2024-01-01 00:00:00"), "entry", 1),
        ("m", ts("2024-01-01 00:00:12"), "page", 2),
    ])
    assert out[1] == 1


def test_bounce_boundary_exactly_gap(spark):
    # within(10s) is [t, t+10): follow-up at exactly +10 s => timeout => jump
    out = _bounce_rows(spark, [
        ("m", ts("2024-01-01 00:00:00"), "entry", 1),
        ("m", ts("2024-01-01 00:00:10"), "page", 2),
        ("n", ts("2024-01-01 00:00:00"), "entry", 3),
        ("n", ts("2024-01-01 00:00:09"), "page", 4),
    ])
    assert out[1] == 1  # 10 s: outside window
    assert out[3] == 0  # 9.(9) s: inside window, continuation


# --- J1/J2 interval join bounds (inclusive, OrderWideApp.java:80-88) -------

def test_interval_join_bounds_inclusive(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 00:01:00"))], "k int, lts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 00:00:55")),  # exactly -5 s: in
            (1, ts("2024-01-01 00:01:05")),  # exactly +5 s: in
            (1, ts("2024-01-01 00:00:54")),  # -6 s: out
            (1, ts("2024-01-01 00:01:06")),  # +6 s: out
            (2, ts("2024-01-01 00:01:00")),  # wrong key
        ],
        "k2 int, rts timestamp",
    )
    j = joins.interval_join(left, right, ("k", "k2"), ("lts", "rts"), "'-5' SECOND", "'5' SECOND")
    got = sorted(r.rts for r in j.collect())
    assert got == [ts("2024-01-01 00:00:55"), ts("2024-01-01 00:01:05")]


def test_interval_join_asymmetric(spark):
    pay = spark.createDataFrame([(1, ts("2024-01-01 01:00:00"))], "k int, pts timestamp")
    orderw = spark.createDataFrame(
        [
            (1, ts("2024-01-01 00:45:00")),  # exactly -15 min: in
            (1, ts("2024-01-01 01:00:00")),  # exactly 0: in
            (1, ts("2024-01-01 01:00:01")),  # after payment: out
            (1, ts("2024-01-01 00:44:59")),  # before window: out
        ],
        "k2 int, ots timestamp",
    )
    j = joins.interval_join(pay, orderw, ("k", "k2"), ("pts", "ots"), "'-15' MINUTE", "'0' SECOND")
    assert j.count() == 2


# --- A6 is_new correction (BaseLogApp.java:64-92) --------------------------

def test_is_new_first_one_kept_zero_untouched(spark):
    df = spark.createDataFrame(
        [
            ("m", ts("2024-01-01 00:00:00"), "1", 1),
            ("m", ts("2024-01-01 00:00:05"), "1", 2),  # later '1' -> '0'
            ("m", ts("2024-01-02 00:00:00"), "1", 3),  # next day '1' -> '0'
            ("n", ts("2024-01-01 00:00:00"), "0", 4),  # '0' stays '0' (cold start)
            ("n", ts("2024-01-01 00:00:05"), "1", 5),  # n's first '1' stays
        ],
        "mid string, ts timestamp, is_new string, eid int",
    )
    out = {r.eid: r.is_new_corrected
           for r in logsplit.correct_is_new(df, "mid", "ts", "is_new", "eid").collect()}
    assert out == {1: "1", 2: "0", 3: "0", 4: "0", 5: "1"}


# --- A5 dedup determinism --------------------------------------------------

def test_daily_unique_keeps_first(spark):
    df = spark.createDataFrame(
        [
            ("m", ts("2024-01-01 08:00:00"), 2),
            ("m", ts("2024-01-01 07:00:00"), 1),  # earliest of the day
            ("m", ts("2024-01-02 01:00:00"), 3),
        ],
        "mid string, ts timestamp, eid int",
    )
    kept = sorted(r.eid for r in dedup.daily_unique(df, "mid", "ts", tiebreak="eid").collect())
    assert kept == [1, 3]


# --- K3 MERGE upsert -------------------------------------------------------

def test_upsert_latest_wins(spark):
    existing = spark.createDataFrame([(1, "a", 0), (2, "b", 0)], "id int, val string, v int")
    updates = spark.createDataFrame([(2, "B", 1), (3, "C", 1)], "id int, val string, v int")
    out = {r.id: r.val for r in merge.upsert_latest(existing, updates, "id", "v").collect()}
    assert out == {1: "a", 2: "B", 3: "C"}


def test_apply_cdc_delete(spark):
    snap = spark.createDataFrame([(1, "a", 0), (2, "b", 0)], "id int, val string, v int")
    changes = spark.createDataFrame(
        [(1, "A", 1, "update"), (2, "b", 1, "delete")], "id int, val string, v int, type string"
    )
    out = {r.id: r.val for r in merge.apply_cdc(snap, changes, "id", "v").collect()}
    assert out == {1: "A"}


def test_incremental_is_new_equals_batch(spark):
    """The compacted first-seen path (state folded batch-by-batch) gives
    the same corrections as correct_is_new over the whole history."""
    from datetime import datetime

    rows = [  # (mid, sec, is_new)
        ("m1", 1, "1"), ("m1", 2, "1"), ("m1", 3, "0"),
        ("m2", 1, "0"), ("m2", 2, "1"), ("m2", 5, "1"),
        ("m3", 4, "1"),
    ]
    df = spark.createDataFrame(
        [(m, datetime(2024, 1, 1, 0, 0, s), i) for m, s, i in rows],
        "mid string, ts timestamp, is_new string",
    )
    want = {(r["mid"], r["ts"]): r["is_new_corrected"]
            for r in logsplit.correct_is_new(df, "mid", "ts").collect()}

    # replay in two batches through the compacted state
    b1 = df.filter(F.col("ts") <= datetime(2024, 1, 1, 0, 0, 2))
    b2 = df.filter(F.col("ts") > datetime(2024, 1, 1, 0, 0, 2))
    state = spark.createDataFrame([], "mid string, first_seen_ts timestamp")
    got = {}
    for b in (b1, b2):
        state = logsplit.update_first_seen(state, b, "mid", "ts")
        out = logsplit.correct_is_new_incremental(b, state, "mid", "ts")
        got.update({(r["mid"], r["ts"]): r["is_new_corrected"] for r in out.collect()})
    assert got == want


def test_visitor_stats_approx_distinct_shape(spark):
    """approx_count_distinct fallback: same schema, plausible counts
    (HLL exact for tiny cardinalities), one fewer shuffle."""
    from datetime import datetime

    from flinkrealtimedatawarehouse_spark.operators import aggs

    df = spark.createDataFrame(
        [(u, 1, datetime(2024, 1, 1, 0, 0, 1), "view", 1.0, None) for u in range(5)],
        "user_id long, event_id long, ts timestamp, event_type string, value double, props string",
    )
    exact = aggs.visitor_stats_tumble(df).collect()
    approx = aggs.visitor_stats_tumble(df, approx_distinct=True).collect()
    assert [r.asDict().keys() for r in exact] == [r.asDict().keys() for r in approx]
    assert approx[0]["uv_ct"] == 5  # HLL is exact at tiny cardinality


def test_interval_join_exclusive_bounds(spark):
    """The reference's exclusivity knobs (FlinkDSJoinTest.java:40-51):
    exclusive bounds drop the rows sitting exactly on the boundary."""
    from datetime import datetime

    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 1, 0))], "lk long, lts timestamp"
    )
    right = spark.createDataFrame(
        [(1, 101, datetime(2024, 1, 1, 0, 0, 55)),   # exactly -5s
         (1, 102, datetime(2024, 1, 1, 0, 1, 5)),    # exactly +5s
         (1, 103, datetime(2024, 1, 1, 0, 1, 0))],   # interior
        "rk long, rid long, rts timestamp",
    )
    args = (left, right, ("lk", "rk"), ("lts", "rts"), "'-5' SECOND", "'5' SECOND")
    inclusive = {r["rid"] for r in joins.interval_join(*args).collect()}
    assert inclusive == {101, 102, 103}
    both_excl = {r["rid"] for r in joins.interval_join(
        *args, lower_exclusive=True, upper_exclusive=True).collect()}
    assert both_excl == {103}
    lo_excl = {r["rid"] for r in joins.interval_join(*args, lower_exclusive=True).collect()}
    assert lo_excl == {102, 103}


def test_upsert_with_schema_evolution(spark):
    """§7.4(5): updates may carry NEW columns (the reference's all-varchar
    auto-DDL / Delta mergeSchema analog) — upsert_latest unions with
    allowMissingColumns, so old rows get NULL for the new column."""
    base = spark.createDataFrame([(1, "x", 0)], "id long, name string, ver long")
    upd = spark.createDataFrame([(2, "y", 1, "extra")], "id long, name string, ver long, note string")
    out = {r["id"]: (r["name"], r["note"]) for r in
           merge.upsert_latest(base, upd, "id", "ver").collect()}
    assert out == {1: ("x", None), 2: ("y", "extra")}


# --- J7 as-of join (beyond ref: latest-state stamping) ---------------------

def _asof(spark, left, right, tolerance=None):
    ldf = spark.createDataFrame(left, "k long, ts timestamp, lid long")
    rdf = spark.createDataFrame(right, "rk long, rts timestamp, val double")
    out = joins.asof_join(
        ldf, rdf, ("k", "rk"), ("ts", "rts"), ["val"], tolerance=tolerance
    )
    return {r["lid"]: (r["matched_ts"], r["val"]) for r in out.collect()}


def test_asof_takes_most_recent_at_or_before(spark):
    t = lambda s: ts(f"2024-01-01 00:{s}")
    out = _asof(
        spark,
        [(1, t("01:00"), 10)],
        [(1, t("00:30"), 1.0), (1, t("00:50"), 2.0), (1, t("01:30"), 3.0)],
    )
    # most recent at-or-before 01:00 is 00:50; the later 01:30 row never matches
    assert out[10] == (t("00:50"), 2.0)


def test_asof_tie_at_equal_ts_matches(spark):
    t = lambda s: ts(f"2024-01-01 00:{s}")
    out = _asof(spark, [(1, t("01:00"), 10)], [(1, t("01:00"), 7.0)])
    assert out[10] == (t("01:00"), 7.0)


def test_asof_no_earlier_row_yields_null(spark):
    t = lambda s: ts(f"2024-01-01 00:{s}")
    out = _asof(spark, [(1, t("01:00"), 10)], [(1, t("01:05"), 7.0), (2, t("00:05"), 8.0)])
    assert out[10] == (None, None)  # right rows: later ts, or other key


def test_asof_tolerance_is_inclusive_and_discards_older(spark):
    t = lambda s: ts(f"2024-01-01 00:{s}")
    out = _asof(
        spark,
        [(1, t("10:00"), 10), (2, t("10:00"), 20)],
        [(1, t("05:00"), 1.0), (2, t("04:59"), 2.0)],
        tolerance="'5' MINUTE",
    )
    assert out[10] == (t("05:00"), 1.0)  # exactly at ts - 5 min: kept
    assert out[20] == (None, None)       # 1 s older than tolerance: nulled


# --- W4 sessionize: gap semantics at exactly the boundary ------------------

def _sessions(spark, rows, gap=10):
    df = spark.createDataFrame(rows, "mid string, ts timestamp, eid int")
    out = sessions.sessionize(df, "mid", "ts", gap, tiebreak="eid")
    return {r.eid: r.session_idx for r in out.collect()}


def test_session_gap_boundary_extends_session(spark):
    # gap is END-INCLUSIVE (matches F.session_window, verified in
    # test_streaming): exactly +gap extends; one microsecond past opens new
    out = _sessions(spark, [
        ("m", ts("2024-01-01 00:00:00"), 1),
        ("m", ts("2024-01-01 00:00:10"), 2),          # exactly +gap -> same
        ("m", ts("2024-01-01 00:00:20.000001"), 3),   # +10.000001s -> new
        ("m", ts("2024-01-01 00:01:00"), 4),          # -> new
    ])
    assert out == {1: 0, 2: 0, 3: 1, 4: 2}


def test_session_per_key_independent(spark):
    out = _sessions(spark, [
        ("a", ts("2024-01-01 00:00:00"), 1),
        ("b", ts("2024-01-01 00:00:01"), 2),
        ("a", ts("2024-01-01 00:00:05"), 3),
    ])
    assert out == {1: 0, 2: 0, 3: 0}


def test_session_stats_bounds_and_duration(spark):
    df = spark.createDataFrame(
        [("m", ts("2024-01-01 00:00:00"), 1), ("m", ts("2024-01-01 00:00:04.5"), 2),
         ("m", ts("2024-01-01 00:01:00"), 3)],
        "mid string, ts timestamp, eid int",
    )
    out = sessions.session_stats(df, "mid", "ts", 10, tiebreak="eid").collect()
    by_idx = {r.session_idx: r for r in out}
    assert by_idx[0].n_events == 2 and by_idx[0].dur_sec == 4.5
    assert by_idx[1].n_events == 1 and by_idx[1].dur_sec == 0.0


# --- A12 grain rollup: one-pass GROUPING SETS ------------------------------

def test_grain_rollup_grains_and_total(spark):
    df = spark.createDataFrame(
        [("p1", "s1", 10.0), ("p1", "s2", 20.0), ("p2", "s1", 5.0)],
        "prio string, status string, amt double",
    )
    out = ads.grain_rollup(df, ["prio", "status"], "amt")
    rows = {(r.prio, r.status): (r.amount, r.row_ct) for r in out.collect()}
    assert rows[("p1", "ALL")] == (30.0, 2)
    assert rows[("p2", "ALL")] == (5.0, 1)
    assert rows[("ALL", "s1")] == (15.0, 2)
    assert rows[("ALL", "s2")] == (20.0, 1)
    assert rows[("ALL", "ALL")] == (35.0, 3)
    assert len(rows) == 5  # single-dim grains + grand total, no (p, s) grain


# --- HLL sketch rollup: mergeable distincts --------------------------------

def test_hll_rollup_equals_direct_sketch_and_tracks_exact(spark):
    """union-of-sketches == sketch-of-union: rolling fine sketches up to a
    coarse grain gives EXACTLY the estimate of sketching the coarse grain
    directly; and at small cardinality the estimate equals the exact
    distinct."""
    from flinkrealtimedatawarehouse_spark.operators import sketches

    rows = [(d, h, f"u{u}") for d in ("d1", "d2") for h in range(3) for u in range(h * 7 + 3)]
    df = spark.createDataFrame(rows, "day string, hr int, uid string")

    fine = sketches.uv_sketch_fine(df, ["day", "hr"], "uid")
    rolled = {r.day: r.uv_est for r in sketches.uv_sketch_rollup(fine, ["day"]).collect()}
    direct = {
        r.day: r.uv_est
        for r in sketches.uv_estimate(sketches.uv_sketch_fine(df, ["day"], "uid"), ["day"]).collect()
    }
    assert rolled == direct  # sketch algebra: union == direct, exactly

    exact = {r.day: r.ct for r in df.groupBy("day").agg(
        F.countDistinct("uid").alias("ct")).collect()}
    assert rolled == exact  # lgk=12 is exact at these cardinalities

    per_hr = {(r.day, r.hr): r.uv_est for r in sketches.uv_estimate(fine, ["day", "hr"]).collect()}
    assert per_hr[("d1", 2)] == 17  # h*7+3 users in hour h


# --- U2 fused rewrite == union form ----------------------------------------

def test_fused_union_agg_equals_union_form(spark):
    """One-scan conditional agg == align_union + tumble_sum, including a
    row matching TWO branches (contributes to both measures, exactly its
    two union copies)."""
    from flinkrealtimedatawarehouse_spark.operators import unions

    df = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), "click", 20.0),   # click AND favor (v>15)
         (1, ts("2024-01-01 11:00:00"), "click", 3.0),    # click only
         (2, ts("2024-01-01 10:30:00"), "view", 1.0),
         (1, ts("2024-01-01 09:00:00"), "error", 0.0)],   # no branch -> excluded
        "item_id int, ts timestamp, event_type string, value double",
    )
    t, v = F.col("event_type"), F.col("value")
    branches = [
        (t == "click", {"click_ct": F.lit(1)}),
        (t == "view", {"view_ct": F.lit(1)}),
        ((t == "click") & (v > 15), {"favor_ct": F.lit(1), "favor_amt": v}),
    ]
    measures = ["click_ct", "view_ct", "favor_ct", "favor_amt"]

    fused = unions.fused_union_agg(df, branches, ["item_id"], "ts", measures, "1 day")
    streams = [(df.filter(c), p) for c, p in branches]
    u = unions.align_union(streams, ["item_id"], "ts", measures)
    union_form = unions.tumble_sum(u, ["item_id"], "ts", measures, "1 day")

    key = lambda r: (r.item_id, r.stt)
    as_map = lambda d: {key(r): (r.click_ct, r.view_ct, r.favor_ct, r.favor_amt) for r in d.collect()}
    got_f, got_u = as_map(fused), as_map(union_form)
    assert got_f == got_u
    assert got_f[(1, "2024-01-01 00:00:00")] == (2.0, 0.0, 1.0, 20.0)
    # the error row matches no branch: not a group on its own
    assert set(got_f) == {(1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:00:00")}


# --- J8 range (band) join ---------------------------------------------------

_BANDS = [(1, 0.0, 10.0), (2, 10.0, 25.0), (3, 25.0, 25.5)]
_FACTS = [(1, 0.0), (2, 10.0), (3, 9.999), (4, 25.0), (5, 25.5), (6, -0.5)]


def _range_matches(spark, chunk, lo_inc=True, hi_inc=False):
    f = spark.createDataFrame(_FACTS, "fact_id long, v double")
    b = spark.createDataFrame(_BANDS, "band_id long, lo double, hi double")
    j = joins.range_join(f, b, "v", "lo", "hi", chunk=chunk, how="left",
                         lo_inclusive=lo_inc, hi_inclusive=hi_inc)
    return {r.fact_id: r.band_id for r in j.collect()}


def test_range_join_half_open_edges(spark):
    # v == lo is in, v == hi belongs to the NEXT band (half-open default)
    expect = {1: 1, 2: 2, 3: 1, 4: 3, 5: None, 6: None}
    assert _range_matches(spark, chunk=None) == expect


def test_range_join_chunked_equals_naive(spark):
    # chunk smaller than, comparable to, and larger than band widths
    naive = _range_matches(spark, chunk=None)
    for chunk in (0.25, 4.0, 100.0):
        assert _range_matches(spark, chunk=chunk) == naive


def test_range_join_inclusive_hi(spark):
    out = _range_matches(spark, chunk=4.0, hi_inc=True)
    # v == 25.5 now matches band 3; v == 10.0 matches bands 1 AND 2 ->
    # fact 2 appears twice, dict keeps one — count rows instead
    f = spark.createDataFrame(_FACTS, "fact_id long, v double")
    b = spark.createDataFrame(_BANDS, "band_id long, lo double, hi double")
    j = joins.range_join(f, b, "v", "lo", "hi", chunk=4.0, how="left", hi_inclusive=True)
    # facts 2 (v=10) and 4 (v=25) each hit two now-overlapping bands,
    # fact 5 matches band 3, fact 6 stays null => 1+2+1+2+1+1
    assert j.count() == 8
    assert out[5] == 3


def test_range_join_chunked_plan_is_hash_join(spark):
    """The chunked path must plan as an equi (hash/sort-merge) join; the
    naive path on an un-broadcastable side would be BroadcastNestedLoop."""
    f = spark.createDataFrame(_FACTS, "fact_id long, v double")
    b = spark.createDataFrame(_BANDS, "band_id long, lo double, hi double")
    plan = joins.range_join(f, b, "v", "lo", "hi", chunk=4.0)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_write_clustered_partition_pruning_skips_directories(spark, tmp_path):
    from flinkrealtimedatawarehouse_spark.operators import layout

    df = spark.range(0, 4000).select(
        F.col("id"),
        F.concat(F.lit("2024-01-0"), (F.col("id") % 4 + 1).cast("string")).alias("dt"),
        (F.col("id") % 997).alias("v"),
    )
    out = str(tmp_path / "events_by_day")
    layout.write_clustered(df, out, ["dt"], cluster_col="v")

    rep = layout.scan_report(spark, out, "dt = '2024-01-02'")
    # directory pruning: the executed scan touched 1 of 4 partitions and
    # only that partition's files
    assert rep["plan_has_partition_filters"]
    assert rep["n_partitions_scanned"] == 1
    assert 0 < rep["n_files_scanned"] < rep["n_files_total"]
    # correctness unchanged by the layout
    assert spark.read.parquet(out).filter("dt = '2024-01-02'").count() == 1000


def test_write_clustered_files_have_narrow_minmax_envelopes(spark, tmp_path):
    """Range clustering must shrink each file's min-max envelope on the
    cluster column — the condition for row-group skipping. Verified via
    parquet footer statistics, the same stats the reader prunes on."""
    import pyarrow.parquet as pq

    from flinkrealtimedatawarehouse_spark.operators import layout

    df = spark.range(0, 8000).select(
        F.col("id"), F.lit("d1").alias("dt"), (F.col("id") % 1000).alias("v")
    )
    out = str(tmp_path / "clustered")
    layout.write_clustered(df, out, ["dt"], cluster_col="v", n_files=4)

    files = spark.read.parquet(out).inputFiles()
    spans = []
    for f in files:
        md = pq.ParquetFile(f.removeprefix("file:")).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(i).path_in_schema == "v"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        spans.append(max(maxs) - min(mins))
    domain = 1000
    # every clustered file covers a small slice of the domain, so a point
    # or range predicate on v skips most files entirely
    assert len(files) >= 3
    assert all(s <= domain / 2 for s in spans)
    assert sum(spans) <= domain * 1.5  # envelopes are nearly disjoint


def test_zorder_clustering_prunes_both_dimensions(spark, tmp_path):
    """Z-order interleave as the cluster key must tighten per-file min-max
    envelopes on BOTH dimensions; a single-column sort only on its own."""
    import pyarrow.parquet as pq

    from flinkrealtimedatawarehouse_spark.operators import layout

    def spans(out, col):
        tot = 0.0
        files = spark.read.parquet(out).inputFiles()
        for f in files:
            md = pq.ParquetFile(f.removeprefix("file:")).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                c = next(
                    md.row_group(rg).column(i)
                    for i in range(md.row_group(rg).num_columns)
                    if md.row_group(rg).column(i).path_in_schema == col
                )
                mins.append(c.statistics.min)
                maxs.append(c.statistics.max)
            tot += max(maxs) - min(mins)
        return tot / len(files)  # mean per-file envelope width

    # two independent uniform dims in [0, 256): x = hashed id, y = reversed
    bits, dom = 8, 256
    df = spark.range(0, 20000).select(
        F.col("id"), F.lit("d").alias("dt"),
        F.pmod(F.xxhash64("id"), F.lit(dom)).alias("x"),
        F.pmod(F.xxhash64(F.col("id") + 1), F.lit(dom)).alias("y"),
    )
    zdf = df.withColumn("z", layout.zorder_value(["x", "y"], bits=bits))

    z_out, x_out = str(tmp_path / "zord"), str(tmp_path / "xsort")
    layout.write_clustered(zdf, z_out, ["dt"], cluster_col="z", n_files=16)
    layout.write_clustered(df, x_out, ["dt"], cluster_col="x", n_files=16)

    # x-sorted layout: x prunes hard, y not at all
    assert spans(x_out, "x") < dom * 0.2
    assert spans(x_out, "y") > dom * 0.8
    # z-ordered layout: BOTH dimensions substantially narrowed
    assert spans(z_out, "x") < dom * 0.6
    assert spans(z_out, "y") < dom * 0.6


def test_zorder_value_interleaves_bits(spark):
    from flinkrealtimedatawarehouse_spark.operators import layout

    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)], "x int, y int")
    got = [r.z for r in df.select(layout.zorder_value(["x", "y"], bits=3).alias("z")).collect()]
    # bit j of x -> position 2j; bit j of y -> position 2j+1
    # (3,5) = x:011, y:101 -> z bits: p0=1,p1=1,p2=1,p3=0,p4=0,p5=1 = 100111b = 39
    assert got == [0, 1, 2, 39]


def test_compact_dir_merges_small_files(spark, tmp_path):
    from flinkrealtimedatawarehouse_spark.operators import layout

    src, out = str(tmp_path / "small"), str(tmp_path / "compacted")
    # 40 tiny files (micro-batch append residue)
    spark.range(0, 4000).select(
        F.col("id"), (F.col("id") % 100).alias("v")
    ).repartition(40).write.parquet(src)
    assert len(spark.read.parquet(src).inputFiles()) == 40

    stats = layout.compact_dir(spark, src, out, target_file_bytes=1 << 30)
    assert stats["files_before"] == 40
    assert stats["files_after"] == 1
    back = spark.read.parquet(out)
    assert back.count() == 4000
    assert back.agg(F.sum("v")).collect()[0][0] == \
        spark.read.parquet(src).agg(F.sum("v")).collect()[0][0]


def test_compact_dir_with_cluster_restores_envelopes(spark, tmp_path):
    """Append order destroys min-max locality; compaction with a cluster
    column must restore it."""
    import pyarrow.parquet as pq

    from flinkrealtimedatawarehouse_spark.operators import layout

    src, out = str(tmp_path / "appended"), str(tmp_path / "reclustered")
    spark.range(0, 8000).select(
        F.col("id"), F.pmod(F.xxhash64("id"), F.lit(1000)).alias("v")
    ).repartition(20).write.parquet(src)  # v scattered across every file

    layout.compact_dir(spark, src, out, target_file_bytes=40_000, cluster_col="v")
    files = spark.read.parquet(out).inputFiles()
    assert len(files) >= 2
    for f in files:
        md = pq.ParquetFile(f.removeprefix("file:")).metadata
        c = next(
            md.row_group(0).column(i)
            for i in range(md.row_group(0).num_columns)
            if md.row_group(0).column(i).path_in_schema == "v"
        )
        # each compacted file covers a narrow v-range again
        assert c.statistics.max - c.statistics.min <= 1000 / len(files) * 2


def test_subsequence_match_vs_numpy_reference(spark):
    """Windowed z-normalized distance must equal a numpy sliding-window
    reference on random series (amplitude/offset invariance included)."""
    import random

    import numpy as np

    from flinkrealtimedatawarehouse_spark.operators import tsmatch

    rng = random.Random(42)
    pattern = [0.0, 1.0, 2.0, 1.0]
    rows = []
    for key in (1, 2):
        for t in range(30):
            rows.append((key, t, rng.uniform(-5, 5)))
    # plant a scaled+shifted copy of the pattern in key 1 at t=10
    for i, p in enumerate(pattern):
        rows[10 + i] = (1, 10 + i, 40.0 + 7.0 * p)
    df = spark.createDataFrame(rows, "k int, t int, v double")

    got = {
        (r.k, r.rank): (r.window_start, r.dist)
        for r in tsmatch.subsequence_match(df, "k", "t", "v", pattern, k=2).collect()
    }

    def ref_best(series, pat, k):
        pat = np.asarray(pat, dtype=float)
        pz = (pat - pat.mean()) / pat.std()
        out = []
        for s in range(len(series) - len(pat) + 1):
            w = np.asarray(series[s:s + len(pat)], dtype=float)
            if w.std() == 0:
                out.append((s, float("inf")))
                continue
            wz = (w - w.mean()) / w.std()
            out.append((s, round(float(np.sqrt(((wz - pz) ** 2).sum())), 6)))
        out.sort(key=lambda x: (x[1], x[0]))
        return out[:k]

    for key in (1, 2):
        series = [v for kk, _, v in rows if kk == key]
        for rank, (s, dist) in enumerate(ref_best(series, pattern, 2), start=1):
            assert got[(key, rank)][0] == s
            assert abs(got[(key, rank)][1] - dist) < 1e-4
    # the planted (scaled, shifted) copy is an exact z-norm match
    assert got[(1, 1)] == (10, 0.0)


def test_histogram_quantiles_incremental_and_bounded_error(spark, tmp_path):
    """Bin counts folded batch-by-batch through the additive sink must
    equal the batch histogram, and the derived quantile estimates must be
    within one bin width of the exact percentiles."""
    import random

    from flinkrealtimedatawarehouse_spark.operators import sketches
    from flinkrealtimedatawarehouse_spark.streaming import sinks as ssinks

    rng = random.Random(99)
    vals = [rng.uniform(0, 100) for _ in range(3000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    width = 5.0

    # incremental: three batches through the OPERATOR's own binning (so
    # this test pins histogram_bins itself), summed by the additive sink
    sink = ssinks.AdditiveGoldSink(
        str(tmp_path / "hist"), ["bin"], {"bin_ct": ("bin_ct", "sum")}
    )
    for i in range(3):
        sl = vals[i * 1000:(i + 1) * 1000]
        b = spark.createDataFrame([(v,) for v in sl], "v double")
        sink.write_batch(sketches.histogram_bins(b, "v", width), i)
    running = sink.current(spark).select(
        "bin", F.col("bin_ct").cast("long").alias("bin_ct")
    )

    batch_hist = sketches.histogram_bins(df, "v", width)
    assert sorted(map(tuple, running.collect())) == \
        sorted(map(tuple, batch_hist.collect()))

    qs = [0.5, 0.9, 0.99]
    est = {r.q: r.q_est for r in
           sketches.quantiles_from_histogram(running, width, qs).collect()}
    exact = sorted(vals)
    for q in qs:
        true = exact[int(q * len(vals)) - 1]
        assert abs(est[q] - true) <= width + 1e-9, (q, est[q], true)


def test_layer_registry_is_consistent():
    """Every inter-stage name is defined once with a known layer; the
    reference's dwd_/dwm_ mismatch pairs resolve to a single constant."""
    from flinkrealtimedatawarehouse_spark import layers

    names = [v for k, v in vars(layers).items() if k.isupper() and isinstance(v, str)]
    assert len(names) == len(set(names))  # no duplicate table names
    for n in names:
        assert n in layers.LAYER_OF, n
        assert layers.LAYER_OF[n] in {"bronze", "silver", "gold"}
        prefix = n.split("_")[0]
        want = {"ods": "bronze", "dwd": "silver", "dwm": "silver", "dws": "gold"}[prefix]
        assert layers.LAYER_OF[n] == want, n
    for canonical, aliases in layers.REFERENCE_ALIASES.items():
        assert canonical in aliases  # the fix keeps one of the two spellings


# --- K3 extensions: SCD2 history + CDF-style snapshot diff -----------------

def test_scd2_history_intervals_and_delete_closure(spark):
    ch = spark.createDataFrame(
        [
            (1, "a", 0, "insert"),
            (1, "b", 1, "update"),
            (2, "x", 0, "insert"),
            (2, "x", 1, "delete"),
            (3, "q", 5, "insert"),
        ],
        "pk long, val string, v int, type string",
    )
    hist = {
        (r.pk, r.valid_from): (r.valid_to, r.is_current, r.val)
        for r in merge.scd2_history(ch, "pk", "v", type_col="type").collect()
    }
    # key 1: v0 closed by v1; v1 open and current
    assert hist[(1, 0)] == (1, False, "a")
    assert hist[(1, 1)] == (None, True, "b")
    # key 2: the delete closes v0 (valid_to=1) and emits no row itself —
    # a deleted key has NO current row
    assert hist[(2, 0)] == (1, False, "x")
    assert (2, 1) not in hist
    # key 3: single insert, open interval
    assert hist[(3, 5)] == (None, True, "q")


def test_snapshot_diff_emits_minimal_changelog(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "pk long, seg string, bal double"
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 25.0), (4, "d", 40.0)], "pk long, seg string, bal double"
    )
    d = {
        r.pk: (r.change_type, r.seg, r.bal)
        for r in merge.snapshot_diff(old, new, "pk", ["seg", "bal"]).collect()
    }
    assert d == {
        2: ("update", "b", 25.0),   # changed value
        3: ("delete", "c", 30.0),   # delete carries the OLD values
        4: ("insert", "d", 40.0),
    }  # pk 1 unchanged => absent


def test_snapshot_diff_null_safe_compare(spark):
    old = spark.createDataFrame([(1, None)], "pk long, seg string")
    new_same = spark.createDataFrame([(1, None)], "pk long, seg string")
    new_set = spark.createDataFrame([(1, "x")], "pk long, seg string")
    assert merge.snapshot_diff(old, new_same, "pk", ["seg"]).count() == 0
    rows = merge.snapshot_diff(old, new_set, "pk", ["seg"]).collect()
    assert [(r.pk, r.change_type, r.seg) for r in rows] == [(1, "update", "x")]


# --- A8 extensions: rolling RANGE-frame metrics + pivot matrix -------------

def test_rolling_metrics_range_frame_respects_calendar_gaps(spark):
    # days 1,2,3 then a jump to day 10: the 3-day MA at day 10 must NOT
    # include day 3 (a ROWS frame would) — RANGE over epoch-day excludes it.
    daily = spark.createDataFrame(
        [
            (datetime(2024, 1, 1), 10.0),
            (datetime(2024, 1, 2), 20.0),
            (datetime(2024, 1, 3), 30.0),
            (datetime(2024, 1, 10), 40.0),
        ],
        "dt timestamp, amount double",
    )
    out = {
        r.dt.strftime("%m-%d"): (r.ma3, r.cume)
        for r in ads.rolling_metrics(daily, "dt", "amount", 3).collect()
    }
    assert out["01-01"] == (10.0, 10.0)
    assert out["01-02"] == (15.0, 30.0)
    assert out["01-03"] == (20.0, 60.0)
    assert out["01-10"] == (40.0, 100.0)  # alone in its 3-day range window


def test_rolling_metrics_partitioned_series(spark):
    daily = spark.createDataFrame(
        [("a", datetime(2024, 1, 1), 1.0), ("a", datetime(2024, 1, 2), 3.0),
         ("b", datetime(2024, 1, 1), 100.0)],
        "k string, dt timestamp, amount double",
    )
    out = {
        (r.k, r.dt.day): r.ma7
        for r in ads.rolling_metrics(daily, "dt", "amount", 7, ["k"]).collect()
    }
    assert out[("a", 2)] == 2.0  # avg(1,3) — b's rows never leak in
    assert out[("b", 1)] == 100.0


def test_pivot_matrix_stable_schema_and_zero_fill(spark):
    ev = spark.createDataFrame(
        [(0, "click"), (0, "click"), (1, "view")], "hr int, event_type string"
    )
    wide = ads.pivot_matrix(ev, "hr", "event_type", ["click", "view", "purchase"])
    # explicit value list => 'purchase' column exists even with no rows
    assert wide.columns == ["hr", "click", "view", "purchase"]
    got = {r.hr: (r.click, r.view, r.purchase) for r in wide.collect()}
    assert got[0] == (2, None, None)
    assert got[1] == (None, 1, None)


# --- Data-quality expectations (beyond ref: P1 generalized) ----------------

def test_check_constraints_split_and_report(spark):
    from flinkrealtimedatawarehouse_spark.operators import quality

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (-1, 3.0), (3, 99.0)], "uid long, val double"
    )
    rules = {
        "uid_pos": F.col("uid") > 0,
        "val_small": F.col("val") < 10,   # NULL val => violation (SQL CHECK)
    }
    valid, viol, report = quality.check_constraints(df, rules)
    assert {r.uid for r in valid.collect()} == {1}
    got_viol = {r.uid: sorted(r.failed_rules) for r in viol.collect()}
    assert got_viol == {2: ["val_small"], -1: ["uid_pos"], 3: ["val_small"]}
    rep = {r.rule: (r.violation_ct, r.total_ct) for r in report.collect()}
    assert rep == {"uid_pos": (1, 4), "val_small": (2, 4)}


def test_ri_violations_finds_orphans_and_null_fks(spark):
    from flinkrealtimedatawarehouse_spark.operators import quality

    child = spark.createDataFrame([(1, 10), (2, 20), (3, None), (4, 99)],
                                  "id long, fk int")
    parent = spark.createDataFrame([(10,), (20,)], "pk int")
    orphans = sorted(r.id for r in quality.ri_violations(child, parent, "fk", "pk").collect())
    assert orphans == [3, 4]  # missing parent AND NULL fk are both orphans


def test_fill_gaps_densifies_and_forward_fills(spark):
    daily = spark.createDataFrame(
        [("a", datetime(2024, 1, 1), 10.0), ("a", datetime(2024, 1, 4), 40.0),
         ("b", datetime(2024, 1, 2), 7.0)],
        "k string, dt timestamp, amount double",
    )
    out = {(r.k, r.dt.day): (r.amount, r.is_filled)
           for r in ads.fill_gaps(daily, "dt", "amount", ["k"]).collect()}
    assert out == {
        ("a", 1): (10.0, 0), ("a", 2): (10.0, 1), ("a", 3): (10.0, 1),
        ("a", 4): (40.0, 0),
        ("b", 2): (7.0, 0),   # single-day partition: no synthesis
    }


def test_scd2_lookup_joins_covering_version(spark):
    """Facts pick the dim version whose interval covers their time:
    half-open [valid_from, valid_to), open intervals cover onward, keys
    with no covering version (pre-insert or post-delete) stay NULL."""
    ch = spark.createDataFrame(
        [(1, "a", 0, "insert"), (1, "b", 5, "update"), (2, "x", 2, "insert"),
         (2, "x", 8, "delete")],
        "pk long, val string, v long, type string",
    )
    hist = merge.scd2_history(ch, "pk", "v", type_col="type")
    facts = spark.createDataFrame(
        [(1, 1, 0), (2, 1, 4), (3, 1, 5), (4, 1, 9),     # key 1 over time
         (5, 2, 1), (6, 2, 3), (7, 2, 8), (8, 9, 4)],    # pre-insert, live, post-delete, unknown key
        "fid long, pk long, at long",
    )
    out = {r.fid: r.val for r in merge.scd2_lookup(facts, hist, "pk", "at", ["val"]).collect()}
    assert out == {
        1: "a",    # [0,5) covers 0
        2: "a",    # covers 4
        3: "b",    # boundary: valid_from inclusive
        4: "b",    # open interval
        5: None,   # before key 2 existed
        6: "x",    # [2,8) covers 3
        7: None,   # deleted at 8 (valid_to exclusive)
        8: None,   # unknown key
    }


def test_funnel_counts_order_and_window(spark):
    """Hand-computed funnel: order violations and deadline expiry must not
    advance a user; t_ev == t_prev (same timestamp) does advance."""
    from datetime import datetime as DT

    from flinkrealtimedatawarehouse_spark.operators import behavior

    rows = [
        # u1 completes in order within 30 min
        (1, DT(2024, 1, 1, 10, 0), "view"),
        (1, DT(2024, 1, 1, 10, 5), "click"),
        (1, DT(2024, 1, 1, 10, 10), "purchase"),
        # u2: click BEFORE the anchor view -> stops at step 1
        (2, DT(2024, 1, 1, 9, 55), "click"),
        (2, DT(2024, 1, 1, 10, 0), "view"),
        (2, DT(2024, 1, 1, 11, 0), "purchase"),  # also past deadline
        # u3: click at exactly the 30-min deadline (inclusive), no purchase
        (3, DT(2024, 1, 1, 10, 0), "view"),
        (3, DT(2024, 1, 1, 10, 30), "click"),
        # u4: purchase before click -> reaches step 2 only
        (4, DT(2024, 1, 1, 10, 0), "view"),
        (4, DT(2024, 1, 1, 10, 2), "purchase"),
        (4, DT(2024, 1, 1, 10, 4), "click"),
        # u5: never views -> not in funnel at all
        (5, DT(2024, 1, 1, 10, 0), "click"),
        (5, DT(2024, 1, 1, 10, 1), "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    out = {
        r.step: (r.step_name, r.user_ct)
        for r in behavior.funnel_counts(
            ev, "user_id", "ts", "event_type", ["view", "click", "purchase"], "30 minutes"
        ).collect()
    }
    assert out[1] == ("view", 4)      # u1..u4
    assert out[2] == ("click", 3)     # u1, u3 (deadline inclusive), u4
    assert out[3] == ("purchase", 1)  # u1 only


def test_retention_cohorts_hand_computed(spark):
    from datetime import datetime as DT

    from flinkrealtimedatawarehouse_spark.operators import behavior

    rows = [
        (1, DT(2024, 1, 1, 8, 0)), (1, DT(2024, 1, 2, 9, 0)),   # back day 1
        (1, DT(2024, 1, 8, 9, 0)),                              # back day 7
        (2, DT(2024, 1, 1, 8, 0)),                              # never returns
        (3, DT(2024, 1, 2, 8, 0)), (3, DT(2024, 1, 3, 8, 0)),   # cohort 01-02, day 1
        (3, DT(2024, 1, 2, 23, 0)),                             # same-day dup ignored
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = {r.cohort_date: r for r in
           behavior.retention_cohorts(ev, "user_id", "ts", horizons=(1, 7)).collect()}
    assert out["2024-01-01"].cohort_size == 2
    assert out["2024-01-01"].ret_1 == 1      # only u1
    assert out["2024-01-01"].ret_7 == 1      # only u1
    assert out["2024-01-02"].cohort_size == 1
    assert out["2024-01-02"].ret_1 == 1
    assert out["2024-01-02"].ret_7 == 0
