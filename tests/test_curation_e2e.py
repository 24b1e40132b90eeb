"""End-to-end LLM-training-data curation pipeline: the composed
clean -> dedup -> quality -> mix -> shuffle -> pack flow a user of the
engine would actually run, on the driver-generated sf0.001 corpus. Each
stage's output feeds the next; the assertions pin the funnel monotonics
and the per-stage contracts (what got dropped and WHY), so a regression
in any operator's composition — not just its isolated semantics —
fails here.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flinkrealtimedatawarehouse_spark.datapipeline import (
    classifier,
    textdedup,
    textstats,
)
from flinkrealtimedatawarehouse_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def curated(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text", "source", "n_chars")
    n0 = docs.count()

    # 1. clean: PII scrub, then substring-level span dedup on the cleaned text
    cleaned = textstats.pii_redact(docs, "text").select(
        "doc_id", F.col("clean_text").alias("text"), "source", "n_chars"
    )
    spans = textdedup.strip_repeated_spans(cleaned, "doc_id", "text", window_n=8)
    cleaned = (
        cleaned.drop("text")
        .join(spans.select("doc_id", "text", "n_kept"), "doc_id")
        .filter(F.col("n_kept") > 0)
    )

    # 2. dedup: exact first (cheap), then MinHash near-dup pairs -> clusters
    exact = textdedup.exact_dedup(cleaned, "doc_id", "text")
    survivors = exact.filter(F.col("is_duplicate") == 0).drop("content_hash", "is_duplicate")
    pairs = textdedup.minhash_near_dups(survivors, "doc_id", "text", threshold=0.8)
    clusters = textdedup.dedup_clusters(pairs, survivors.select("doc_id"), "doc_id")
    keep_ids = clusters.filter(F.col("cluster") == F.col("doc_id")).select("doc_id")
    deduped = survivors.join(keep_ids, "doc_id", "left_semi")

    # 3. quality: Gopher heuristics gate, then the trained classifier gate
    gated = textstats.gopher_rules(deduped, "text", min_words=10).filter("gopher_pass")
    feats = textstats.embed_text(
        gated.select("doc_id", "text", "source", "n_kept"), "doc_id", "text", dim=8
    )
    # weak labels: heuristic quality score split at its own median so both
    # classes exist regardless of the corpus's score distribution
    q = textstats.quality_score(feats, "text")
    med = q.agg(F.percentile_approx("quality", 0.5)).collect()[0][0]
    q = q.withColumn("label", (F.col("quality") >= med).cast("int"))
    w = classifier.train_logreg(q, "embedding", "label", dim=8, n_iter=25, lr=2.0)
    passed = classifier.filter_by_quality(q, "embedding", w, threshold=0.2).drop(
        "quality_prob"
    )

    # 4. mix -> split -> shuffle -> pack
    mixed = textstats.mix_sample(
        passed, "doc_id",
        {**{f"src{i}": 1.0 for i in range(10)}, **{f"src{i}": 0.5 for i in range(10, 20)}},
        "source",
    )
    split = textstats.split_assign(mixed, "doc_id")
    train = split.filter("split = 'train'")
    shuffled = textstats.global_shuffle(train, "doc_id", n_shards=4)
    packed = textstats.concat_chunks(
        shuffled.withColumn("n_toks", F.col("n_kept")),
        "doc_id", "n_toks", seq_len=512, part_col="shard",
    )
    return {
        "n0": n0,
        "cleaned": cleaned,
        "deduped": deduped,
        "passed": passed,
        "train": train,
        "shuffled": shuffled,
        "packed": packed,
    }


@pytest.mark.slow
def test_funnel_is_monotone_and_nonempty(curated):
    n0 = curated["n0"]
    n_clean = curated["cleaned"].count()
    n_dedup = curated["deduped"].count()
    n_pass = curated["passed"].count()
    n_train = curated["train"].count()
    assert n0 >= n_clean >= n_dedup >= n_pass >= n_train
    assert n_train > 0
    assert n_dedup < n_clean  # the synthetic corpus does contain duplicates


def test_no_pii_survives_the_pipeline(curated):
    leaked = curated["passed"].filter(
        F.col("text").rlike(textstats.PII_EMAIL) | F.col("text").rlike(textstats.PII_PHONE)
    )
    assert leaked.count() == 0


@pytest.mark.slow
def test_shuffle_covers_train_exactly(curated):
    train_ids = {r.doc_id for r in curated["train"].select("doc_id").collect()}
    rows = curated["shuffled"].select("doc_id", "shard", "pos").collect()
    assert {r.doc_id for r in rows} == train_ids
    seen = {}
    for r in rows:
        seen.setdefault(r.shard, set()).add(r.pos)
    for shard, ps in seen.items():
        assert ps == set(range(len(ps)))  # dense 0..n-1 per shard


def test_packed_blocks_are_full_except_tail(curated):
    per_block = (
        curated["packed"].groupBy("shard", "block").agg(F.sum("n_toks").alias("t"))
        .collect()
    )
    by_shard = {}
    for r in per_block:
        by_shard.setdefault(r.shard, []).append((r.block, r.t))
    for shard, blocks in by_shard.items():
        blocks.sort()
        *full, last = blocks
        assert all(t == 512 for _, t in full)
        assert 0 < last[1] <= 512
