"""Document deduplication family (north-star LLM-data-pipeline operators).

All shapes are bucket-bounded: candidate generation is always a
groupBy/self-join on a short key (content hash, LSH band, SimHash band,
hyperplane bucket) — never an all-pairs cross join — so the shuffle volume
at 100 TB is O(data), not O(data²). Verification (Jaccard / Hamming /
cosine) runs only on within-bucket candidate pairs.

Hash/shingle expressions come from ``hashing`` so the DuckDB oracle can
reproduce every value exactly (see hashing.py docstring).
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from flinkrealtimedatawarehouse_spark.datapipeline.hashing import (
    spark_hash_shingles,
    spark_hash_shingles_wide,
    spark_minhash,
    spark_phash,
    spark_token_hashes,
    spark_tokens,
)

# --- exact dedup ----------------------------------------------------------

def normalize_text(col: Column) -> Column:
    """Canonical form for exact dedup: lowercase, non-alnum runs -> single
    space, trimmed. (Same expression exists verbatim in the oracle.)"""
    return F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "))


def exact_dedup(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    prefer_col: str | None = None,
) -> DataFrame:
    """Exact dedup via content-hash groupBy: one survivor per normalized
    text. Returns docs + ``content_hash``/``is_duplicate``.

    Survivor choice: min id by default; with ``prefer_col``, the HIGHEST
    value of that column wins (id-tiebroken) — real pipelines keep the
    best-quality duplicate (richest metadata, highest quality score), not
    the first-crawled one.

    Scale: grouping happens on the 64-char sha2, not the document body —
    the exchange carries ids+hashes only after the aggregate is pushed
    map-side. The survivor choice is deterministic either way.
    """
    hashed = docs.withColumn("content_hash", F.sha2(normalize_text(F.col(text_col)), 256))
    if prefer_col is None:
        w = Window.partitionBy("content_hash")
        return hashed.withColumn(
            "is_duplicate", (F.col(id_col) != F.min(id_col).over(w)).cast("int")
        )
    wr = Window.partitionBy("content_hash").orderBy(
        F.col(prefer_col).desc(), F.col(id_col).asc()
    )
    return hashed.withColumn(
        "is_duplicate", (F.row_number().over(wr) != 1).cast("int")
    )


# --- MinHash + LSH near-dup ----------------------------------------------

def minhash_signatures(docs: DataFrame, id_col: str, text_col: str,
                       shingle_n: int = 3, k: int = 16) -> DataFrame:
    """(id, sh_hashes, sig): word-n-gram shingle HASHES + k-perm MinHash
    signature. Docs with fewer than ``shingle_n`` tokens are dropped.

    Cost note: one md5 per TOKEN; each n-gram hash is an integer rolling
    combination of its token hashes (hashing.spark_hash_shingles) — n×
    fewer md5 calls and no shingle-string allocation vs hashing the
    concatenated n-gram text. Jaccard then runs on the distinct hash sets
    (30ish-bit space: same value as string-set Jaccard up to vanishing
    collision probability, and the oracle uses the identical hashes).
    """
    # Structure matters for 100×+ more than it looks:
    # - the row filter runs on size(toks) — NOT size(sh_hashes) — because
    #   Catalyst's filter pushdown substitutes aliases into the predicate
    #   unconditionally; a predicate over sh_hashes inlines the whole
    #   tokens→md5→Horner tree, and each element_at(th, ·) inside the
    #   transform lambda then re-evaluates the full token-hash array per
    #   shingle position (~150× the md5 work; measured 44 s of a 48 s
    #   stage at sf0.1). size(toks) >= n is the same row set.
    # - each stage is its own projection so the next references a bound
    #   attribute; CollapseProject keeps the boundary (non-cheap producer
    #   referenced more than once).
    return (
        docs.select(F.col(id_col), spark_tokens(F.col(text_col)).alias("toks"))
        .filter(F.size("toks") >= shingle_n)
        .select(id_col, spark_token_hashes(F.col("toks")).alias("th"))
        .select(id_col, F.array_distinct(spark_hash_shingles(F.col("th"), shingle_n)).alias("sh_hashes"))
        .select(id_col, "sh_hashes", spark_minhash(F.col("sh_hashes"), k).alias("sig"))
    )


def lsh_band_rows(sigs: DataFrame, id_col: str, bands: int, rows_per_band: int) -> DataFrame:
    """Explode each signature into its ``bands`` LSH band rows
    ``(id, band_idx, band_key)`` — the bucket-join key for candidate
    generation (shared by the batch self-join below and the streaming
    band-state sink in ``streaming/neardup.py``)."""
    return sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_idx"),
                        F.concat_ws("_", *[F.col("sig")[bi * rows_per_band + r] for r in range(rows_per_band)]).alias("band_key"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_key")


def lsh_candidate_pairs(sigs: DataFrame, id_col: str, bands: int, rows_per_band: int,
                        hot_bucket_cap: int | None = None,
                        join_width: int | None = None) -> DataFrame:
    """Banded LSH: signature -> ``bands`` keys of ``rows_per_band`` values;
    candidate pair = same (band_idx, band_key). The self-join key is the
    band bucket, so the shuffle is bucket-bounded. Returns distinct
    (id_a, id_b) with id_a < id_b.

    ``hot_bucket_cap``: skew guard. A band bucket of size c contributes
    c*(c-1)/2 join rows — one pathological bucket (empty strings, a
    boilerplate header shared by millions of docs) turns the bucket-join
    into an all-pairs quadratic blowup on a single key, the classic LSH
    scale-killer at 100 TB. Buckets larger than the cap switch from
    all-pairs to REPRESENTATIVE CHAINING: every member pairs only against
    the bucket's representative — c-1 rows instead of c*(c-1)/2, so the
    work is O(c) per hot bucket while the dup graph stays CONNECTED (a
    boilerplate megacluster that is hot in every band still collapses to
    one survivor under ``dedup_clusters``; pre-round-10 semantics excluded
    hot buckets entirely, which made all-bands-hot clusters invisible).
    The representative ROTATES by band parity — min id on even bands, max
    id on odd bands (round 11) — so a drift-shaped chain (A~B~…~Z where
    the ends are not near-dups of each other) collects witnesses from
    BOTH ends instead of only the min-id end, at the same O(c) cost.
    Use ``lsh_hot_bucket_stats`` to account for the non-witness candidate
    mass the chaining skips. None (default) keeps the exact behavior.

    ``join_width``: pin the width of the bucket self-join (round 14,
    guide §2.5). The band rows are a few MB (ids + short keys) so AQE
    coalesces the exchange feeding the join by BYTES — at sf1 the join
    stage (pair emission + partial distinct, 6.5 s of executor time) ran
    in 4 coalesced tasks behind a 1.7 s straggler wall. An explicit hash
    repartition on the join key is never coalesced, and in the capped
    path also satisfies the sizes groupBy/join distribution. The two
    self-join aliases do NOT share one exchange at runtime (round 15:
    the executed-plan dump ``plans/r15/dp2_selfjoin_runtime.txt`` shows
    two ``hashpartitioning(band_idx, band_key)`` REPARTITION_BY_NUM
    nodes and no ReusedExchange — AQE does not canonicalize the aliased
    sides together); that second exchange is immaterial because the
    cached ``sigs`` feed it and its payload is the same few MB of band
    rows (A/B at sf1, fresh JVM per config: probe-side-only repartition
    4.03/3.98 s vs both-sides 4.01/4.13 s — flat). The win is the WIDTH
    of the pair-emission stage, not exchange count.
    It is a PARAMETER, not unconditional, because at small inputs the
    added exchange + extra AQE stage waves cost more than the straggler
    they remove (A/B at sf0.1: unconditional widening regressed the
    steady wall 1.7 -> 2.5 s while sf1 improved 4.3 -> 3.8 s); callers
    gate it on measured input size (see ``minhash_near_dups``)."""
    exploded = lsh_band_rows(sigs, id_col, bands, rows_per_band)
    if join_width is not None:
        exploded = exploded.repartition(join_width, "band_idx", "band_key")
    if hot_bucket_cap is not None:
        sizes = exploded.groupBy("band_idx", "band_key").agg(
            F.count(F.lit(1)).alias("_bsz"),
            F.min(id_col).alias("_lo"),
            F.max(id_col).alias("_hi"),
        )
        # inner join on the (already-shuffled) bucket key: AQE plans the
        # size side tiny relative to the explode, and the split lands
        # BEFORE the quadratic self-join
        cool = exploded.join(
            sizes.filter(F.col("_bsz") <= hot_bucket_cap).select("band_idx", "band_key"),
            ["band_idx", "band_key"],
        )
        rep = F.when(F.col("band_idx") % 2 == 0, F.col("_lo")).otherwise(F.col("_hi"))
        hot_pairs = (
            exploded.join(
                sizes.filter(F.col("_bsz") > hot_bucket_cap).select(
                    "band_idx", "band_key", rep.alias("_rep")
                ),
                ["band_idx", "band_key"],
            )
            .filter(F.col(id_col) != F.col("_rep"))
            .select(
                F.least(F.col(id_col), F.col("_rep")).alias("id_a"),
                F.greatest(F.col(id_col), F.col("_rep")).alias("id_b"),
            )
        )
    else:
        cool, hot_pairs = exploded, None
    a = cool.alias("a")
    b = cool.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
    if hot_pairs is not None:
        pairs = pairs.unionByName(hot_pairs)
    return pairs.distinct()


def lsh_hot_bucket_stats(sigs: DataFrame, id_col: str, bands: int,
                         rows_per_band: int, hot_bucket_cap: int) -> DataFrame:
    """Accounting for the skew guard: one row with ``hot_buckets`` (band
    buckets over the cap) and ``dropped_candidates`` (sum of
    c*(c-1)/2 - (c-1) over them — the NON-WITNESS candidate mass that
    representative chaining skips: each hot bucket still emits its c-1
    representative pairs (min id on even bands, max id on odd — the
    rotation changes WHICH pairs are witnesses, not how many per bucket),
    so connectivity survives, and this figure is a per-bucket UPPER BOUND
    on skipped candidates, NOT distinct lost pairs: a pair colliding in
    several hot bands is counted once per band, and pairs that also
    co-occur in a cool bucket still surface there in full). Run this
    alongside a capped dedup so the skip is measured, never silent."""
    sizes = (
        lsh_band_rows(sigs, id_col, bands, rows_per_band)
        .groupBy("band_idx", "band_key")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return _over_cap_stats(sizes, hot_bucket_cap)


def _shuffle_width(spark) -> int:
    """spark.sql.shuffle.partitions as an int, falling back to
    defaultParallelism on platforms where the conf is non-numeric (e.g.
    "auto" under Databricks AQE auto-tuning — round 14 ADVICE)."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (ValueError, TypeError):
        return spark.sparkContext.defaultParallelism


def jaccard_verify(pairs: DataFrame, sigs: DataFrame, id_col: str,
                   width: int | None = None) -> DataFrame:
    """n-gram Jaccard on the true (hashed) shingle sets of candidate pairs
    only — never all pairs.

    ``width``: optional explicit repartition between the pair/shingle
    joins and the compute-dense ``array_intersect``/``array_union``
    projection (round 14, guide §2.5): AQE coalesces the post-join
    partitions by BYTES (the (id, id, two shingle arrays) rows are only
    a few MB) but the set intersection is compute-dense — measured at
    sf1: 22.7 s of executor time squeezed into 4 AQE-coalesced tasks, a
    5.7 s straggler wall; the explicit width took dp2@sf1 4.84 -> 3.73 s.
    SIZE-GATED BY CALLERS since round 15 (same discipline as the
    self-join's ``join_width``): round 14 shipped it unconditional, but
    with the self-join gate in place the extra exchange is pure overhead
    at small inputs — A/B fresh JVM: sf0.001 1.38 -> 1.58 s, sf0.01
    1.05 -> 1.33 s, sf0.1 1.41 -> 1.80 s with the unconditional width.
    ``minhash_near_dups`` passes the deployment-scaled shuffle width
    above the same measured band-row threshold that widens the
    self-join; None (default) adds no exchange."""
    sets_ = sigs.select(F.col(id_col), F.col("sh_hashes"))
    j = (
        pairs.join(sets_.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh_hashes", "sh_a"), "id_a")
        .join(sets_.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh_hashes", "sh_b"), "id_b")
    )
    if width is not None:
        j = j.repartition(width)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    uni = F.size(F.array_union("sh_a", "sh_b"))
    return j.select(
        "id_a", "id_b", F.round(inter.cast("double") / uni.cast("double"), 6).alias("jaccard")
    )


# Band-row count above which the LSH bucket self-join gets an explicit
# width (join_width in lsh_candidate_pairs). Measured crossover class:
# at 46k band rows (sf0.1) widening REGRESSES the wall (+0.8 s of
# exchange + AQE stage-wave latency vs a sub-second join stage); at 457k
# (sf1) it removes a 1.7 s four-task straggler. The boundary sits where
# the narrow join stage's compute (~ band rows x bucket sizes) crosses
# the ~0.3 s cost of one more exchange + stage wave — O(100k) rows here;
# anything deployment-scale is orders of magnitude past it.
_WIDE_SELFJOIN_MIN_BAND_ROWS = 250_000


def minhash_near_dups(docs: DataFrame, id_col: str, text_col: str,
                      shingle_n: int = 3, k: int = 16,
                      bands: int = 8, threshold: float = 0.5,
                      hot_bucket_cap: int | None = None) -> DataFrame:
    """End-to-end MinHash-LSH near-dup: shingle -> sign -> band -> bucket
    self-join -> Jaccard verify -> pairs >= threshold.

    Perf: the signature subtree (tokenize -> shingle -> md5/shingle -> k
    permutation mins) is the CPU-dense stage; it is (a) spread across the
    cluster with a round-robin repartition so small file-split counts don't
    serialize it, and (b) persisted, because three consumers read it (both
    sides of the band self-join + the Jaccard verifier) and recomputing it
    per consumer tripled the wall time at sf0.1.
    """
    assert k % bands == 0, "k must divide into equal bands"
    n_part = docs.sparkSession.sparkContext.defaultParallelism
    sigs = minhash_signatures(docs.repartition(n_part), id_col, text_col, shingle_n, k)
    sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # Size the bucket self-join from the data, not a constant (round
        # 14, guide §2): the count() materializes the signature cache the
        # three consumers below read anyway (work moved, not added) and
        # decides whether the self-join gets an explicit width. Below the
        # threshold the join stage is sub-second at ANY width and the
        # extra exchange/stage waves only add latency (A/B in
        # ``lsh_candidate_pairs``); above it, AQE's byte-based coalescing
        # squeezes the compute-dense pair emission into a handful of
        # tasks. Deployment-scale corpora always take the wide path.
        wide = sigs.count() * bands >= _WIDE_SELFJOIN_MIN_BAND_ROWS
        n_shuffle = _shuffle_width(docs.sparkSession)
        cands = lsh_candidate_pairs(sigs, id_col, bands, k // bands,
                                    hot_bucket_cap=hot_bucket_cap,
                                    join_width=n_shuffle if wide else None)
        out = jaccard_verify(cands, sigs, id_col,
                             width=n_shuffle if wide else None).filter(
            F.col("jaccard") >= threshold)
        # materialize the (small) pair set, then release the signature
        # cache — repeated invocations otherwise accumulate cached blocks
        return out.localCheckpoint(eager=True)
    finally:
        sigs.unpersist()


# --- SimHash --------------------------------------------------------------

SIMHASH_BITS = 32
SIMHASH_BAND_BITS = 8

# recursive sign-stratification inside over-cap embedding buckets
# (embedding_near_dups): each level splits still-hot groups by a further
# disjoint hyperplane family of _ED_REFINE_PLANES planes. Tuned by the
# sf1 sibling-recall decomposition (SCALE.md round 12): 4-plane levels
# halve the sign-flip exposure but their 16-way split leaves groups over
# the cap (x1 residue 54% vs 0.3%) — discrimination binds before flip
# loss does, so levels keep the full 8 planes. The residual ~15% of
# co-bucket sibling pairs lost to stratum-boundary flips is the measured
# ceiling of AND-composed sign refinement; the documented knob for
# recovering it is OR-amplification (an independent second family per
# level, union of candidates, 2x cost) — not shipped, priced in SCALE.md.
_ED_REFINE_DEPTH = 2
_ED_REFINE_PLANES = 8


def simhash(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """32-bit SimHash over distinct-token hashes (unweighted): bit i is 1
    iff sum over tokens of (2*bit_i(h)-1) > 0. Pure built-ins."""
    # Filter on token count BEFORE hashing: a predicate over `th` would be
    # pushed down with the md5 transform inlined (one extra full-array md5
    # eval per row) — see minhash_signatures for the pathological case.
    hashed = (
        docs.select(F.col(id_col), F.array_distinct(spark_tokens(F.col(text_col))).alias("toks"))
        .filter(F.size("toks") > 0)
        .select(id_col, F.transform("toks", lambda t: spark_phash(t)).alias("th"))
    )
    def _bit_sum(i: int):
        # factory (not lambda defaults): PySpark counts default params as HOF arity
        return F.aggregate(
            "th",
            F.lit(0).cast("long"),
            lambda acc, h: acc + (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1),
        )

    bit_sums = [_bit_sum(i) for i in range(SIMHASH_BITS)]
    sim = None
    for i, s in enumerate(bit_sums):
        term = F.when(s > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return hashed.select(F.col(id_col), sim.cast("bigint").alias("simhash"))


def _simhash_band_rows(sims: DataFrame, id_col: str) -> DataFrame:
    """(id, simhash) -> one row per (id, band_idx, band_val) 8-bit slice."""
    n_bands = SIMHASH_BITS // SIMHASH_BAND_BITS
    return sims.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_idx"),
                        F.shiftright("simhash", bi * SIMHASH_BAND_BITS).bitwiseAND(F.lit(255)).alias("band_val"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "simhash", "band.band_idx", "band.band_val")


def _over_cap_stats(sizes: DataFrame, cap: int,
                    both_ends: bool = False) -> DataFrame:
    """(bucket-size rows with column ``c``) -> one accounting row: buckets
    over the cap and an upper bound on the candidates the cap's
    representative chaining skips in them — c*(c-1)/2 all-pairs minus the
    witness pairs each hot bucket still emits (multi-band collisions
    counted once per band; pairs that also co-occur in a cool bucket still
    surface there). Witnesses per hot bucket: c-1 for the banded families
    (sorted-neighbor chain: segment chains + segment-head chain), 2c-3
    with ``both_ends`` (the
    bandless embedding family chains against BOTH the min- and max-id
    member; the (min, max) pair is shared between the two ends)."""
    hot = sizes.filter(F.col("c") > cap)
    witnesses = (
        (2 * F.col("c") - 3) if both_ends else (F.col("c") - 1)
    )
    return hot.agg(
        F.count(F.lit(1)).alias("hot_buckets"),
        F.coalesce(
            F.sum(F.col("c") * (F.col("c") - 1) / 2 - witnesses), F.lit(0.0)
        )
        .cast("long")
        .alias("dropped_candidates"),
    )


def simhash_hot_bucket_stats(docs: DataFrame, id_col: str, text_col: str,
                             hot_bucket_cap: int) -> DataFrame:
    """Accounting twin of ``simhash_near_dups(hot_bucket_cap=...)`` — run
    alongside a capped dedup so the drop is measured, never silent (same
    contract as ``lsh_hot_bucket_stats``)."""
    sizes = (
        _simhash_band_rows(simhash(docs, id_col, text_col), id_col)
        .groupBy("band_idx", "band_val")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return _over_cap_stats(sizes, hot_bucket_cap)


def embedding_hot_bucket_stats(emb: DataFrame, id_col: str, vec_col: str,
                               n_planes: int, hot_bucket_cap: int,
                               quant: int = 1000) -> DataFrame:
    """Accounting twin of ``embedding_near_dups(hot_bucket_cap=...)``."""
    from flinkrealtimedatawarehouse_spark.datapipeline.similarity import (
        hyperplane_bucket,
        quantized,
    )

    sizes = (
        emb.select(quantized(F.col(vec_col), quant).alias("q"))
        .select(hyperplane_bucket(F.col("q"), n_planes).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return _over_cap_stats(sizes, hot_bucket_cap, both_ends=True)


def simhash_near_dups(docs: DataFrame, id_col: str, text_col: str,
                      max_hamming: int = 3,
                      hot_bucket_cap: int | None = None) -> DataFrame:
    """SimHash near-dup: band on 8-bit slices (pigeonhole: hamming<=3 over
    4 bands guarantees one identical band), bucket self-join, exact
    Hamming verify with bit_count(xor).

    ``hot_bucket_cap``: the same skew guard as ``lsh_candidate_pairs`` — a
    band bucket of size c contributes c*(c-1)/2 self-join rows, and
    simhashes of templated/boilerplate corpora CLUSTER (measured on the
    10x amplified bench corpus: 57k docs -> an 24k-doc band bucket ->
    885M candidate pairs, a driver-killing blowup on identical code that
    passes at small scale). Buckets above the cap switch to sorted-
    neighbor chaining (below): c-1 witness rows, O(c) work, so an
    all-bands-hot megacluster still verifies witness pairs and collapses
    under ``dedup_clusters`` instead of becoming invisible to near-dedup.
    None keeps the exact all-pairs behavior.

    SORTED-NEIGHBOR chains (round 14, replacing round 12's stratified
    reps): an 8-bit band has only 256 values, so at corpus scale hot
    buckets DILUTE — many unrelated templates share one band value, and
    ANY fixed single representative (bucket-end or stratum min-id)
    eventually becomes template-arbitrary: the r12 stratum scheme cut
    the all-hot residue from 2.0% to 2 docs at sf1x4, but those 2 docs
    had TRUE partners at Hamming 2-3 whose shared stratum's min-id rep
    was an alien template at Hamming 7-10 (scale_probe dp3res named
    them) — the same dilution, one 8-bit level down. Fix: within each
    hot bucket, sort members by their own simhash ROTATED so the next
    band (cyclically) is the lowest byte, and pair each member with its
    predecessor. Near-dup pairs sort adjacent in the bucket where their
    differing bits are least significant — a pair corrupted only in
    band j differs in the LOW byte of bucket (j-1)'s sort key, so same-
    template docs are numeric neighbors and witnesses verify; identical
    docs chain at Hamming 0, so megaclusters still collapse under
    ``dedup_clusters``. Exactly c-1 witness pairs per hot bucket (the
    count ``_over_cap_stats`` prices). For parallelism the chain is
    segmented: members chain within their top varying byte (band j+3's
    value, <=256 segments sorted independently — no single-task sort of
    a mega-bucket), segment heads chain across the bucket; (c - S) +
    (S - 1) = c - 1. Mirrored term-for-term in the dp3 gate's DuckDB
    twin.

    Consumer note: the chain makes verified components PATH-shaped
    (diameter up to the longest same-template run), so cluster
    assignment over capped-simhash pairs should use
    ``dedup_clusters_star`` (O(log n) rounds on any graph shape) —
    plain ``dedup_clusters`` label-prop needs diameter rounds and hits
    its ``max_iter`` guard on corpus-scale runs (measured: sf1x4 grow
    exceeds 50 rounds)."""
    exploded = _simhash_band_rows(simhash(docs, id_col, text_col), id_col)
    if hot_bucket_cap is not None:
        sizes = exploded.groupBy("band_idx", "band_val").agg(
            F.count(F.lit(1)).alias("_bsz"),
        )
        cool = exploded.join(
            sizes.filter(F.col("_bsz") <= hot_bucket_cap).select("band_idx", "band_val"),
            ["band_idx", "band_val"],
        )
        n_bands = SIMHASH_BITS // SIMHASH_BAND_BITS
        hot_members = exploded.join(
            sizes.filter(F.col("_bsz") > hot_bucket_cap).select(
                "band_idx", "band_val"
            ),
            ["band_idx", "band_val"],
        )
        # rotate-right so band (band_idx+1) is the lowest byte: the top
        # byte of the rotated key is band_idx's value — constant within
        # the bucket — so the effective sort is over the 3 OTHER bands,
        # nearest-band least significant
        _k = f"(pmod(band_idx + 1, {n_bands}) * {SIMHASH_BAND_BITS})"
        rotk = F.expr(
            f"shiftright(simhash, {_k}) | "
            f"shiftleft(simhash & (shiftleft(cast(1 as bigint), {_k}) - 1), "
            f"{SIMHASH_BITS} - {_k})"
        )
        # segment = the top VARYING byte of the rotated key (band_idx+3's
        # value): chains sort per segment in parallel, never one task per
        # mega-bucket; a pair differing only in the two low bytes shares
        # its segment and chains there
        seg = F.expr(
            f"shiftright(simhash, pmod(band_idx + 3, {n_bands}) "
            f"* {SIMHASH_BAND_BITS}) & 255"
        )
        hs = hot_members.withColumn("_rotk", rotk).withColumn("_seg", seg)
        w_seg = Window.partitionBy("band_idx", "band_val", "_seg").orderBy(
            "_rotk", id_col
        )
        member_chain = (
            hs.withColumn("_prev_id", F.lag(id_col).over(w_seg))
            .withColumn("_prev_sim", F.lag("simhash").over(w_seg))
            .filter(F.col("_prev_id").isNotNull())
        )
        # segment heads (min sort position) chain across the bucket so
        # the bucket stays one connected witness path
        sreps = (
            hs.groupBy("band_idx", "band_val", "_seg")
            .agg(F.min(F.struct("_rotk", F.col(id_col), F.col("simhash")))
                 .alias("_m"))
            .select(
                "band_idx", "band_val",
                F.col("_m._rotk").alias("_rotk"),
                F.col(f"_m.{id_col}").alias(id_col),
                F.col("_m.simhash").alias("simhash"),
            )
        )
        w_bkt = Window.partitionBy("band_idx", "band_val").orderBy(
            "_rotk", id_col
        )
        rep_chain = (
            sreps.withColumn("_prev_id", F.lag(id_col).over(w_bkt))
            .withColumn("_prev_sim", F.lag("simhash").over(w_bkt))
            .filter(F.col("_prev_id").isNotNull())
        )

        def _pairize(ch):
            # sim_a stays the simhash OF id_a (the cool branch's
            # invariant, so a pair surfacing in several branches dedupes
            # under distinct)
            first = F.col(id_col) < F.col("_prev_id")
            return ch.select(
                F.least(F.col(id_col), F.col("_prev_id")).alias("id_a"),
                F.greatest(F.col(id_col), F.col("_prev_id")).alias("id_b"),
                F.when(first, F.col("simhash"))
                .otherwise(F.col("_prev_sim")).alias("sim_a"),
                F.when(first, F.col("_prev_sim"))
                .otherwise(F.col("simhash")).alias("sim_b"),
            )

        hot_pairs = _pairize(member_chain).unionByName(_pairize(rep_chain))
    else:
        cool, hot_pairs = exploded, None
    a, b = cool.alias("a"), cool.alias("b")
    cands = a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_val") == F.col("b.band_val"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.col("a.simhash").alias("sim_a"),
        F.col("b.simhash").alias("sim_b"),
    )
    if hot_pairs is not None:
        cands = cands.unionByName(hot_pairs)
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    # verify BEFORE the dedupe: a pair re-emitted by several shared bands
    # (or witness branches) carries the same per-doc simhashes, hence the
    # same hamming — so the distinct collapses identically AFTER the
    # filter, and the shuffle moves only VERIFIED narrow rows instead of
    # every duplicate candidate with both signature columns. The
    # bit_count re-computed per duplicate is map-side and trivial.
    return (
        cands.select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# --- embedding-cosine near-dup -------------------------------------------

def embedding_near_dups(emb: DataFrame, id_col: str, vec_col: str,
                        threshold: float = 0.95, n_planes: int = 8,
                        quant: int = 1000,
                        hot_bucket_cap: int | None = None) -> DataFrame:
    """Near-dup pairs by cosine >= threshold, LSH-bucketed by integer
    hyperplane signs (see similarity.hyperplane_bucket): candidates share a
    bucket, then exact integer-quantized cosine verifies. High-cosine pairs
    agree on most hyperplane signs, so same-bucket recall is high at
    near-dup thresholds; the bucket join keeps the shuffle linear.

    ``hot_bucket_cap``: same skew guard as the banded families — buckets
    above the cap (embedding clusters collapse onto few sign patterns on
    templated corpora) switch to representative chaining. This family has
    no bands to rotate a representative across, so a hot bucket chains
    against BOTH its min-id and max-id member (2c-3 distinct rows, still
    O(c)) — a drift-shaped chain gets witnesses from both ends — keeping
    the dup graph connected for ``dedup_clusters``. None = exact.

    STRATIFIED refinement (round 12, same dilution mechanism the SimHash
    residue exposed, but the fix differs): an 8-plane sign space has only
    256 buckets, so hot buckets DILUTE at corpus scale — many unrelated
    vector clusters share one sign pattern, the two chain-end
    representatives are cluster-arbitrary, and the cosine verify fails
    for almost every member (measured at sf1: 97-99% of hot members
    carried ZERO verified pairs while their true near-identical siblings
    sat co-bucketed). Each hot bucket is therefore refined RECURSIVELY by
    further disjoint hyperplane families (``_ED_REFINE_PLANES`` planes
    per level at ``plane_offset = n_planes + (k-1) * _ED_REFINE_PLANES``,
    depth ``_ED_REFINE_DEPTH`` — fewer planes per level than the primary
    bucket, see the constants' comment):

    - groups that fall UNDER the cap at any level run ALL-PAIRS — exactly
      the semantics a cool bucket gets, so co-located siblings become
      direct candidates (rep-chaining inside a stratum would NOT work
      here: unlike SimHash, where band+stratum pin 16 of the 32 hashed
      bits and the Hamming verify then passes against any co-stratum rep,
      shared sign bits imply nothing about cosine >= threshold — a
      stratum rep is as cluster-arbitrary as a bucket rep; measured:
      rep-only stratification moved the sf1 residue 97% -> 89%, one
      all-pairs level -> 37-55% with sibling recall still capped at
      55-76% because level-1 strata saturate at x4, recursion is what
      closes it);
    - still-hot groups descend one more level; BOTTOM-level leftovers
      chain members to their group's min-id rep and reps to the bucket's
      min-id end;
    - the bucket-level BOTH-ENDS chain stays for every member
      (connectivity for ``dedup_clusters`` is exactly as before).

    Cost stays linear-with-cap: all-pairs only inside <= cap groups
    bounds the extra candidates at cap*c/2 per hot bucket PER LEVEL —
    the same budget the cap already grants cool buckets. Mirrored
    term-for-term (unrolled to depth 2) in the dp3 gate's DuckDB twin."""
    from flinkrealtimedatawarehouse_spark.datapipeline.similarity import (
        _sq_norm,
        hyperplane_bucket,
        quantized,
    )

    q = emb.select(
        F.col(id_col),
        quantized(F.col(vec_col), quant).alias("q"),
    ).withColumn("bucket", hyperplane_bucket(F.col("q"), n_planes)).withColumn(
        "_n", _sq_norm(F.col("q"))  # once per ROW, not twice per PAIR
    )
    if hot_bucket_cap is not None:
        sizes = q.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("_bsz"),
            F.min(F.struct(F.col(id_col), F.col("q"), F.col("_n"))).alias("_lo"),
            F.max(F.struct(F.col(id_col), F.col("q"), F.col("_n"))).alias("_hi"),
        )
        cool = q.join(
            sizes.filter(F.col("_bsz") <= hot_bucket_cap).select("bucket"), "bucket"
        )
        hot_members = q.join(
            sizes.filter(F.col("_bsz") > hot_bucket_cap).select("bucket", "_lo", "_hi"),
            "bucket",
        )
        # both-ends chaining (no bands to rotate across): member vs min-id
        # rep AND member vs max-id rep; the shared (lo, hi) pair carries
        # identical values from both arms, deduped by the distinct below
        lo_cands = hot_members.filter(F.col(id_col) > F.col(f"_lo.{id_col}")).select(
            F.col(f"_lo.{id_col}").alias("id_a"),
            F.col(id_col).alias("id_b"),
            F.col("_lo.q").alias("qa"),
            F.col("q").alias("qb"),
            F.col("_lo._n").alias("na"),
            F.col("_n").alias("nb"),
        )
        hi_cands = hot_members.filter(F.col(id_col) < F.col(f"_hi.{id_col}")).select(
            F.col(id_col).alias("id_a"),
            F.col(f"_hi.{id_col}").alias("id_b"),
            F.col("q").alias("qa"),
            F.col("_hi.q").alias("qb"),
            F.col("_n").alias("na"),
            F.col("_hi._n").alias("nb"),
        )

        def _vs(members, rep_struct):
            # member vs a representative struct; (qa, na) stay the vector
            # OF id_a so pairs surfacing in several branches dedupe under
            # the distinct downstream
            first = F.col(id_col) < F.col(f"{rep_struct}.{id_col}")
            return (
                members.filter(F.col(id_col) != F.col(f"{rep_struct}.{id_col}"))
                .select(
                    F.least(F.col(id_col), F.col(f"{rep_struct}.{id_col}")).alias("id_a"),
                    F.greatest(F.col(id_col), F.col(f"{rep_struct}.{id_col}")).alias("id_b"),
                    F.when(first, F.col("q")).otherwise(F.col(f"{rep_struct}.q")).alias("qa"),
                    F.when(first, F.col(f"{rep_struct}.q")).otherwise(F.col("q")).alias("qb"),
                    F.when(first, F.col("_n")).otherwise(F.col(f"{rep_struct}._n")).alias("na"),
                    F.when(first, F.col(f"{rep_struct}._n")).otherwise(F.col("_n")).alias("nb"),
                )
            )

        # RECURSIVE stratified refinement under disjoint hyperplane
        # families (docstring): at each level, groups that fall under the
        # cap run all-pairs (co-located siblings become direct
        # candidates); still-hot groups descend one more level; bottom-
        # level leftovers rep-chain. The bucket-level both-ends chain
        # above keeps connectivity regardless.
        frames = [lo_cands, hi_cands]
        cur = hot_members
        gcols = ["bucket"]
        for lvl in range(1, _ED_REFINE_DEPTH + 1):
            cur = cur.withColumn(
                f"_st{lvl}",
                hyperplane_bucket(
                    F.col("q"), _ED_REFINE_PLANES,
                    plane_offset=n_planes + (lvl - 1) * _ED_REFINE_PLANES,
                ),
            )
            gcols = gcols + [f"_st{lvl}"]
            sz = cur.groupBy(*gcols).agg(
                F.count(F.lit(1)).alias("_ssz"),
                F.min(F.struct(F.col(id_col), F.col("q"), F.col("_n"))).alias("_sr"),
                F.first("_lo").alias("_blo"),
            )
            cool_l = cur.join(
                sz.filter(F.col("_ssz") <= hot_bucket_cap).select(*gcols), gcols
            )
            sa, sb = cool_l.alias("sa"), cool_l.alias("sb")
            cond = F.col(f"sa.{id_col}") < F.col(f"sb.{id_col}")
            for g in gcols:
                cond = cond & (F.col(f"sa.{g}") == F.col(f"sb.{g}"))
            frames.append(
                sa.join(sb, cond).select(
                    F.col(f"sa.{id_col}").alias("id_a"),
                    F.col(f"sb.{id_col}").alias("id_b"),
                    F.col("sa.q").alias("qa"),
                    F.col("sb.q").alias("qb"),
                    F.col("sa._n").alias("na"),
                    F.col("sb._n").alias("nb"),
                )
            )
            hot_sz = sz.filter(F.col("_ssz") > hot_bucket_cap)
            if lvl == _ED_REFINE_DEPTH:
                # bottom: leftovers chain to their group's min-id rep,
                # reps chain to the bucket's min-id end
                frames.append(_vs(
                    cur.join(hot_sz.select(*gcols, "_sr"), gcols), "_sr"
                ))
                frames.append(_vs(
                    hot_sz.select(
                        F.col(f"_sr.{id_col}").alias(id_col),
                        F.col("_sr.q").alias("q"),
                        F.col("_sr._n").alias("_n"),
                        F.col("_blo").alias("_lo"),
                    ),
                    "_lo",
                ))
            else:
                cur = cur.join(hot_sz.select(*gcols), gcols)
        hot_cands = functools.reduce(lambda x, y: x.unionByName(y), frames)
    else:
        cool, hot_cands = q, None
    a, b = cool.alias("a"), cool.alias("b")
    cands = a.join(
        b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.col("a.q").alias("qa"),
        F.col("b.q").alias("qb"),
        F.col("a._n").alias("na"),
        F.col("b._n").alias("nb"),
    )
    if hot_cands is not None:
        cands = cands.unionByName(hot_cands)
    dot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    # same zero-norm convention as similarity._cosine_given_norms: a zero
    # vector (empty-doc embedding) is similar to nothing (0.0), never a
    # DIVIDE_BY_ZERO abort
    _prod = F.col("na").cast("double") * F.col("nb").cast("double")
    cos = F.when(
        _prod > 0, F.round(dot.cast("double") / F.sqrt(_prod), 6)
    ).otherwise(F.lit(0.0))
    out = cands.select("id_a", "id_b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )
    if hot_cands is not None:
        # dedupe is only needed on the chained path: cool buckets emit a
        # pair once (one bucket per doc), but the (lo, hi) witness arrives
        # from both ends of every hot bucket and stratum branches can
        # re-emit a pair. Dedupe AFTER the verify, on the narrow
        # (id_a, id_b, cosine) rows: every branch orients the pair the
        # same way (qa/na always id_a's vector), so duplicates carry
        # bit-identical cosine — a distinct over the WIDE candidate rows
        # shuffled both quantized vectors per pair (~2 KB/row, the
        # dominant exchange at sf1×4), where this one moves two ids and a
        # double; duplicate dot products cost O(dup × d) map-side, far
        # below the avoided shuffle
        out = out.distinct()
    return out


# --- benchmark decontamination -------------------------------------------

def ngram_overlap(docs: DataFrame, bench: DataFrame, id_col: str, text_col: str,
                  n: int = 3) -> DataFrame:
    """Decontamination check: per document, the fraction of its distinct
    token n-grams that appear anywhere in the benchmark set ``bench``
    (the standard train/test-overlap filter before LLM training).

    Scale shape: the benchmark gram set is small (test suites, not
    corpora) — distinct-reduce it and let the join broadcast; the corpus
    side is explode -> one partial-agg groupBy per doc. No all-pairs
    anything; corpus cost is O(grams). Grams join on the 62-bit combined
    hash: in the 31-bit space, ~1e8 corpus grams x 1e5 benchmark grams
    yields thousands of birthday-collision false hits, each silently
    dropping a CLEAN doc from training data.
    """
    def grams(df, keep_id):
        cols = [F.col(id_col)] if keep_id else []
        toks_df = df.select(*cols, spark_tokens(F.col(text_col)).alias("toks")).filter(
            F.size("toks") >= n
        )
        th_df = toks_df.select(*cols, spark_token_hashes(F.col("toks")).alias("th"))
        return th_df.select(
            *cols,
            F.explode(F.array_distinct(spark_hash_shingles_wide(F.col("th"), n))).alias("g"),
        )

    doc_g = grams(docs, keep_id=True)
    bench_g = grams(bench, keep_id=False).distinct()
    totals = doc_g.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        doc_g.join(F.broadcast(bench_g), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        totals.join(hits, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double") / F.col("n_grams"), 6
            ).alias("overlap"),
        )
    )


# --- dedup cluster assignment (connected components) ----------------------

def dedup_clusters(pairs: DataFrame, ids: DataFrame, id_col: str,
                   max_iter: int = 50,
                   rounds_out: list | None = None) -> DataFrame:
    """Canonical-document assignment: connected components over near-dup
    pairs via min-label propagation — every doc gets ``cluster`` = the
    smallest doc id reachable through the dup graph (the id to KEEP; all
    others are the dedup drop set).

    Pregel-style iteration: each round joins labels across (symmetrized)
    edges and takes the min; rounds needed = graph diameter, which for
    dup clusters is tiny. Each round is one shuffle on the edge key; the
    loop stops early when no label changes (one lightweight count action
    per round — the standard driver-coordinated fixpoint, same as
    GraphX/GraphFrames CC). At extreme scale — or adversarial long
    near-dup chains — use ``dedup_clusters_star`` below: same output
    contract, O(log^2 n) rounds independent of graph diameter.

    ``rounds_out``: if a list is passed, the executed round count is
    appended — instrumentation for the scale probe's rounds-vs-n check.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # eager localCheckpoint per round, NOT persist: the convergence probe
    # below is limit(1).count(), which materializes (and therefore
    # caches) only the partitions it touches — a later round would then
    # recompute the untouched partitions through the already-unpersisted
    # previous labels, growing the plan by one full round per iteration
    # (observed as a driver wedged in Catalyst on a multi-round graph).
    # Checkpointing truncates the lineage unconditionally.
    labels = ids.select(F.col(id_col).alias("node"), F.col(id_col).alias("label"))
    converged = False
    n_rounds = 0
    for _ in range(max_iter):
        n_rounds += 1
        neigh = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh, labels["node"] == neigh["node2"], "left")
            .select(
                F.col("node"),
                F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if rounds_out is not None:
        rounds_out.append(n_rounds)
    if not converged:
        # wrong labels are worse than no labels: a component with diameter
        # > max_iter would silently mislabel its far members
        raise RuntimeError(
            f"dedup_clusters did not converge within {max_iter} rounds "
            "(component diameter exceeds max_iter) — raise max_iter"
        )
    result = labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster"))
    return result.localCheckpoint(eager=True)


def dedup_clusters_star(pairs: DataFrame, ids: DataFrame, id_col: str,
                        max_rounds: int = 25,
                        rounds_out: list | None = None) -> DataFrame:
    """Connected components via alternating big-star/small-star (Kiveris
    et al. 2014, "Connected Components in MapReduce and Beyond") — the
    extreme-scale variant of ``dedup_clusters``. Identical output
    contract: every doc gets ``cluster`` = the smallest reachable doc id.

    Why a second algorithm: min-label propagation converges in
    graph-DIAMETER rounds — fine for typical dup clusters (diameter ~2-3)
    but a pathological near-dup chain of length d (each doc a near-dup of
    the next) costs d shuffles. The star contraction converges in
    O(log^2 n) rounds regardless of diameter:

    - large-star: every neighbor v > u re-links to m = min(N(u) ∪ {u});
    - small-star: every neighbor v <= u (and u itself) re-links to m.

    Each round is two grouped aggregations over the current edge list;
    edge count never grows (each input edge maps to at most one output
    edge), and the fixpoint is a star centered at each component's
    minimum. Fixpoint detection = symmetric set difference of
    consecutive edge lists (two limit-1 anti-join probes, cheaper than a
    full count when unchanged). Same convergence contract as
    ``dedup_clusters``: raises instead of silently mislabeling.
    """
    # eager localCheckpoint per round, not persist: each round rewrites
    # the whole edge list, so the lineage would otherwise deepen by ~8
    # operators per round and the fixpoint probes would recompute the
    # full chain back to round 0 (label prop tolerates this for its 2-3
    # typical rounds; star runs up to O(log^2 n) rounds by design)
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _star(e: DataFrame, large: bool) -> DataFrame:
        nbrs = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
        m = (
            nbrs.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least(F.col("u"), F.col("mv")).alias("m"))
        )
        j = nbrs.join(m, "u")
        if large:
            out = j.filter(F.col("v") > F.col("u")).select(
                F.col("v").alias("u"), F.col("m").alias("v")
            )
        else:
            out = (
                j.filter(F.col("v") <= F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .unionByName(m.select("u", F.col("m").alias("v")))
            )
        return out.filter(F.col("u") != F.col("v")).distinct()

    converged = edges.limit(1).count() == 0
    n_rounds = 0
    for _ in range(max_rounds):
        if converged:
            break
        n_rounds += 1
        nxt = _star(_star(edges, large=True), large=False).localCheckpoint(eager=True)
        unchanged = (
            nxt.exceptAll(edges).limit(1).count() == 0
            and edges.exceptAll(nxt).limit(1).count() == 0
        )
        edges = nxt
        if unchanged:
            converged = True
    if rounds_out is not None:
        rounds_out.append(n_rounds)
    if not converged:
        raise RuntimeError(
            f"dedup_clusters_star did not converge within {max_rounds} "
            "rounds — raise max_rounds (O(log^2 n) expected)"
        )
    # fixpoint edge list is a star per component: (v, component_min)
    lbl = edges.groupBy("u").agg(F.min("v").alias("cluster"))
    result = (
        ids.select(F.col(id_col))
        .join(lbl, F.col(id_col) == F.col("u"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("cluster"), F.col(id_col)).alias("cluster"),
        )
    )
    result = result.localCheckpoint(eager=True)
    return result


def span_window_hashes(toks_df: DataFrame, id_col: str, window_n: int) -> DataFrame:
    """(id, pos, wh) rows: the 62-bit combined hash of every
    length-``window_n`` token window — the shared key space of batch
    substring dedup AND the streaming span-state sink (identical
    expressions, so the two agree bit-for-bit)."""
    return (
        toks_df.filter(F.size("toks") >= window_n)
        .select(id_col, spark_token_hashes(F.col("toks")).alias("th"))
        .select(
            id_col,
            F.posexplode(spark_hash_shingles_wide(F.col("th"), window_n)).alias("pos", "wh"),
        )
    )


def merge_islands(dup: DataFrame, id_col: str) -> DataFrame:
    """Interval-island merge per doc over marked (id, pos, end) windows:
    a window starts a new island iff it begins past the running max end
    of all earlier windows. Returns (``id_col``, ``_isl``, ``_s`` start,
    ``_e`` exclusive end, ``_wct`` marked-window count). Shared by the
    batch detect/remove pair and the streaming sink."""
    by_pos = Window.partitionBy(id_col).orderBy(F.col("pos").asc())
    prev = by_pos.rowsBetween(Window.unboundedPreceding, -1)
    run = by_pos.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        dup.withColumn("_pmax", F.max("end").over(prev))
        .withColumn(
            "_new",
            F.when(F.col("_pmax").isNull() | (F.col("pos") > F.col("_pmax")), 1).otherwise(0),
        )
        .withColumn("_isl", F.sum("_new").over(run))
        .groupBy(id_col, "_isl")
        .agg(
            F.min("pos").alias("_s"),
            F.max("end").alias("_e"),
            F.count(F.lit(1)).alias("_wct"),
        )
    )


def _marked_islands(toks_df: DataFrame, id_col: str, window_n: int) -> DataFrame:
    """Shared marking pipeline of substring dedup: rolling-hash every
    length-``window_n`` token window (62-bit combined hash — the 31-bit
    space would mark unique spans as duplicates by birthday collision at
    corpus scale), mark every non-first occurrence by (id, pos), and
    merge the marked windows into per-doc interval islands. Both the
    detect and remove halves derive from this one rule, so they can
    never disagree."""
    wh = span_window_hashes(toks_df, id_col, window_n)
    first_w = Window.partitionBy("wh").orderBy(F.col(id_col).asc(), F.col("pos").asc())
    dup = (
        wh.withColumn("_rn", F.row_number().over(first_w))
        .filter(F.col("_rn") > 1)
        .select(id_col, "pos", (F.col("pos") + window_n).alias("end"))
    )
    return merge_islands(dup, id_col)


def repeated_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    window_n: int = 20,
) -> DataFrame:
    """Corpus-wide repeated token-span detection — the distributed
    approximation of exact substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better": remove
    any ≥50-token span that repeats anywhere in the corpus; they build a
    monolithic suffix array, which has no shard-parallel equivalent, so
    the scalable form fixes the span length and rolling-hashes every
    length-``window_n`` token window instead).

    Any window hash occurring at more than one (doc, pos) — across docs
    OR within one doc — is a repeated span; the first occurrence by
    (``id_col``, pos) is canonical and every later one is marked. Returns
    one row per input doc: ``n_tokens``, ``n_windows``, ``dup_windows``
    (non-canonical repeated windows), ``dup_coverage`` (tokens under the
    union of the marked spans — overlapping windows merged by interval
    islands, so a long verbatim quote counts its length once, not once
    per window), ``dup_frac``.

    Scale: one exchange on the 62-bit window hash (row_number per hash
    group — group size = duplication count, bounded like any dup-family
    bucket) + one exchange on the doc id for the island merge. Shuffle
    carries (id, pos, hash) triples, never text. No all-pairs anything.
    """
    # Same discipline as minhash_near_dups: the tokenize + rolling-hash
    # subtree is CPU-dense, and its parallelism is otherwise bound by the
    # input's file-split count (measured at sf1: 31.5 s of executor time
    # on 10 file-bound tasks, a 3.2 s wall). The round-robin repartition
    # costs one exchange of the raw text and prices the stage by compute;
    # at deployment scale scans have >= cluster-width splits and this
    # widens nothing (repartition to defaultParallelism only when the
    # scan is narrower).
    sc = docs.sparkSession.sparkContext
    if docs.rdd.getNumPartitions() < sc.defaultParallelism:
        docs = docs.repartition(sc.defaultParallelism)
    toks_df = docs.select(F.col(id_col), spark_tokens(F.col(text_col)).alias("toks"))
    base = toks_df.select(
        F.col(id_col),
        F.size("toks").alias("n_tokens"),
        F.greatest(F.size("toks") - window_n + 1, F.lit(0)).alias("n_windows"),
    )
    islands = (
        _marked_islands(toks_df, id_col, window_n)
        .withColumn("_cov", F.col("_e") - F.col("_s"))
        .groupBy(id_col)
        .agg(F.sum("_cov").alias("dup_coverage"), F.sum("_wct").alias("dup_windows"))
    )
    return base.join(islands, id_col, "left").select(
        id_col,
        "n_tokens",
        "n_windows",
        F.coalesce(F.col("dup_windows"), F.lit(0)).cast("long").alias("dup_windows"),
        F.coalesce(F.col("dup_coverage"), F.lit(0)).cast("long").alias("dup_coverage"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.coalesce(F.col("dup_coverage"), F.lit(0)) / F.col("n_tokens"), 6),
        ).otherwise(F.lit(0.0)).alias("dup_frac"),
    )


def strip_repeated_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    window_n: int = 20,
) -> DataFrame:
    """The removal half of substring dedup: drop every token covered by a
    non-canonical repeated span (the SAME ``_marked_islands`` rule as
    ``repeated_spans`` — detect and remove cannot disagree) and
    reassemble the surviving tokens in order. Returns
    (``id_col``, deduped ``text``, ``n_kept``, ``n_tokens``).

    Note the rebuilt text is the token stream (lowercased, punctuation
    collapsed) — span removal is defined on token positions, so the
    output is the cleaned TOKEN sequence, the form a tokenizer-bound
    training pipeline consumes anyway.

    Scale: the covered positions are exploded from merged islands (one
    row per covered token, only for docs that had duplicates) and
    anti-joined against the token stream — both joins are on (id, pos).
    """
    toks_df = docs.select(F.col(id_col), spark_tokens(F.col(text_col)).alias("toks"))
    covered = _marked_islands(toks_df, id_col, window_n).select(
        id_col, F.explode(F.sequence(F.col("_s"), F.col("_e") - 1)).alias("pos")
    )
    stream = toks_df.select(id_col, F.posexplode("toks").alias("pos", "tok"))
    kept = stream.join(covered, [id_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda x: x["tok"]
            ),
        ).alias(text_col),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = toks_df.select(F.col(id_col), F.size("toks").alias("n_tokens"))
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.col("n_tokens").cast("long"),
    )


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Line-level corpus dedup (the C4 cleaning rule): across the WHOLE
    corpus, keep only the first occurrence of each distinct normalized
    line — first by (``id_col``, line position) — then reassemble each
    document from its surviving lines in order. Whitespace-only lines are
    structural, not content, and are always kept.

    Output: one row per input doc — ``id_col``, deduped ``text``,
    ``n_kept``/``n_lines`` line counts (a doc whose every line was seen
    earlier keeps only its blank lines, possibly an empty text).
    ``sep`` is a regex (Spark ``split`` semantics); the default matches
    literal newlines.

    Scale: one exchange on the normalized line (first-occurrence window —
    same shuffle an exact line-groupBy pays; hot lines like boilerplate
    headers make ONE big group each, the window only reads min per group
    so AQE skew-split applies) + one exchange on the doc id to
    reassemble. Never an all-pairs comparison.
    """
    lines = docs.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line")
    ).withColumn("_norm", F.lower(F.trim(F.col("line"))))
    # blanks bypass the window entirely: they are always kept, and routing
    # them through row_number would funnel EVERY blank line in the corpus
    # into one window partition (single-task sort) — the one skew no
    # salting fixes because the group genuinely is one key
    blanks = lines.filter(F.col("_norm") == "")
    w = Window.partitionBy("_norm").orderBy(F.col(id_col).asc(), F.col("pos").asc())
    content_first = (
        lines.filter(F.col("_norm") != "")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    kept = blanks.unionByName(content_first)
    n_lines = docs.select(
        F.col(id_col), F.size(F.split(F.col(text_col), sep)).alias("n_lines")
    )
    out = kept.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
        ).alias(text_col),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return n_lines.join(out, id_col, "left").select(
        id_col,
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        "n_lines",
    )
