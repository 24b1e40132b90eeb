"""Similarity search over an embedding column (north-star operator).

Two paths, same answer shape:

- ``cosine_topk``    — brute-force baseline: probes × corpus with the probe
                       side broadcast, exact integer-quantized arithmetic
                       (bit-for-bit reproducible in the DuckDB oracle — no
                       float-association drift).
- ``ann_topk_lsh``   — the scale path: random-hyperplane LSH where the
                       hyperplanes are deterministic INTEGER weight vectors
                       so the sign bits (and hence buckets) are exactly
                       reproducible; candidates = same bucket, then exact
                       cosine re-rank. At 100 TB the bucket join replaces
                       the probes×corpus product with a per-bucket join;
                       recall is tunable via n_planes (fewer planes ->
                       bigger buckets -> higher recall, more compute).

Quantization: q_i = round(x_i * 1000) :: bigint. Dot products and norms on
q are exact integers; cosine = dot/sqrt(na*nb) is one IEEE double op each,
identical in Spark and DuckDB, then rounded to 6 dp before ranking with an
id tiebreak — fully deterministic ranking.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1000
# weight(plane, dim) = ((plane*1000003 + dim*7919 + plane*dim*104729) % 1997)
# - 998 (integers in [-998, 998]; same closed form is embedded in the
# oracle SQL). The plane*dim CROSS TERM is load-bearing (round 13):
# without it, a plane's weights across dims form an arithmetic ramp mod
# 1997 with the SAME stride (7919) for every plane — different planes
# were mere shifts of one sawtooth, so "disjoint" plane families were
# heavily correlated and an 8-bit bucket carried far fewer than 8 bits
# of direction (measured at sf1x4: 60,893 of 80k vectors sat in
# over-1000 sign buckets, and the recursive refinement families stalled
# at 10.8k still-hot members after depth 2 because each new family
# re-asked nearly the same question). With per-plane strides
# (7919 + plane*104729 mod 1997), the same corpus has ZERO over-cap
# buckets while sibling co-bucket recall stays 98.5%.
PLANE_A, PLANE_B, PLANE_MOD, PLANE_SHIFT = 1000003, 7919, 1997, 998
PLANE_C = 104729
# NB: these constants are part of the on-disk format of anything that
# PERSISTS sign-bucket values (streamed band-state sinks, persisted LSH
# tables): changing them invalidates that state — rebuild such indexes
# on upgrade (in-repo state is all scratch-dir-scoped, nothing survives).


def quantized(vec: Column, quant: int = QUANT) -> Column:
    """array<float> -> array<bigint> of round(x*quant)."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * quant, 0).cast("bigint"))


def _plane_weight(plane: int, dim_idx: Column) -> Column:
    return (
        F.lit(plane * PLANE_A)
        + dim_idx * F.lit(PLANE_B + plane * PLANE_C)
    ) % F.lit(PLANE_MOD) - F.lit(PLANE_SHIFT)


def hyperplane_bucket(q: Column, n_planes: int, plane_offset: int = 0) -> Column:
    """Sign-LSH bucket id from deterministic integer hyperplanes: bit p =
    1 iff sum_d(w(p+offset,d) * q_d) > 0. Exact integer arithmetic
    end-to-end. ``plane_offset`` selects a disjoint hyperplane family —
    table t of a multi-table LSH uses offset t*n_planes, so tables hash
    independently while staying fully deterministic."""
    def _proj(p: int):
        # factory (not lambda defaults): PySpark counts default params as HOF arity
        return F.aggregate(
            F.zip_with(
                q,
                F.sequence(F.lit(0), F.size(q) - 1),
                lambda x, d: x * _plane_weight(p, d),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    bucket = None
    for p in range(n_planes):
        bit = F.when(_proj(p + plane_offset) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("bigint")


def _dot(qa: Column, qb: Column) -> Column:
    return F.aggregate(F.zip_with(qa, qb, lambda x, y: x * y), F.lit(0).cast("long"), lambda a, x: a + x)


def _sq_norm(q: Column) -> Column:
    return F.aggregate(F.transform(q, lambda x: x * x), F.lit(0).cast("long"), lambda a, x: a + x)


def _cosine_given_norms(qa: Column, qb: Column, na: Column, nb: Column) -> Column:
    """Cosine when the (integer) squared norms are already materialized.

    The pair stage of every top-k path is P probes x N candidates; HOFs
    are interpreted (no whole-stage codegen), so computing each side's
    norm ONCE per row instead of once per PAIR removes 2 of the 3 O(d)
    array passes from the hot loop. Same expression tree tail as
    ``_exact_cosine`` (cast-to-double then multiply), so values are
    bit-identical to the unfactored form.

    Zero-norm convention: cosine is undefined for the zero vector, and
    zero vectors DO reach these paths in real corpora (``embed_text``
    maps an empty document to the zero vector by its own guard). Define
    similarity as 0.0 — "similar to nothing" — instead of letting ANSI
    mode abort the whole job with DIVIDE_BY_ZERO. The guard leaves the
    nonzero branch's expression tree untouched, so all existing values
    stay bit-identical."""
    prod = na.cast("double") * nb.cast("double")
    return F.when(
        prod > 0, F.round(_dot(qa, qb).cast("double") / F.sqrt(prod), 6)
    ).otherwise(F.lit(0.0))


def _exact_cosine(qa: Column, qb: Column) -> Column:
    return _cosine_given_norms(qa, qb, _sq_norm(qa), _sq_norm(qb))


def cosine_topk(emb: DataFrame, probes: DataFrame, id_col: str, vec_col: str,
                k: int = 5, quant: int = QUANT) -> DataFrame:
    """Brute-force exact top-k: for each probe row, the k nearest corpus
    vectors by cosine (excluding self). Probe side broadcasts — the corpus
    is never replicated, so this scales to any corpus size for a bounded
    probe set; for probe-set ~ corpus use ``ann_topk_lsh``."""
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"), quantized(F.col(vec_col), quant).alias("qn")
    ).withColumn("_cn", _sq_norm(F.col("qn")))
    probe_q = probes.select(
        F.col(id_col).alias("probe_id"), quantized(F.col(vec_col), quant).alias("qp")
    ).withColumn("_pn", _sq_norm(F.col("qp")))
    scored = corpus.join(F.broadcast(probe_q), F.col("probe_id") != F.col("neighbor_id")).select(
        "probe_id", "neighbor_id",
        _cosine_given_norms(F.col("qp"), F.col("qn"), F.col("_pn"), F.col("_cn")).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


def ivf_topk(emb: DataFrame, probes: DataFrame, id_col: str, vec_col: str,
             label_col: str, k: int = 5, n_probe: int = 2,
             quant: int = QUANT) -> DataFrame:
    """IVF-style ANN: coarse quantizer = per-``label_col`` centroid (the
    inverted-file cell); each probe searches only its ``n_probe`` nearest
    cells, exact cosine re-rank within.

    Centroids are element-wise integer SUMS of the quantized vectors —
    cosine is scale-invariant, so sum == mean for ranking, and integer
    sums are associative: no float-association drift between engines or
    between runs, unlike a float mean.

    Scale: the centroid table is tiny (one row per cell) and broadcasts;
    the candidate join is (probe x n_probe cells) -> corpus co-partitioned
    by cell — shuffle per probe is bounded by its cells' sizes, never the
    whole corpus. On a real deployment the label column is the output of a
    k-means coarse quantizer; any assignment column works.
    """
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("cell"),
        quantized(F.col(vec_col), quant).alias("qn"),
    )
    probe_q = probes.select(
        F.col(id_col).alias("probe_id"), quantized(F.col(vec_col), quant).alias("qp")
    )
    probe_cells = _rank_probe_cells(probe_q, _cell_centroids(corpus), n_probe)
    return _cell_rerank(corpus, probe_cells, k)


def _cell_centroids(corpus: DataFrame) -> DataFrame:
    """Element-wise integer-sum centroid per cell over (cell, qn) rows —
    THE centroid definition every IVF path (in-memory, persisted index)
    shares, so the parity contract lives in one place."""
    pos = corpus.select("cell", F.posexplode(F.col("qn")).alias("pos", "qv"))
    return (
        pos.groupBy("cell", "pos")
        .agg(F.sum("qv").alias("s"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("s")))),
                lambda x: x["s"],
            ).alias("cvec")
        )
    )


def _rank_probe_cells(probe_q: DataFrame, cent: DataFrame, n_probe: int) -> DataFrame:
    """Per probe: its n_probe centroid-nearest cells (cosine desc, cell
    asc tie-break) — shared by every IVF path."""
    cw = Window.partitionBy("probe_id").orderBy(F.col("ccos").desc(), F.col("cell").asc())
    return (
        probe_q.withColumn("_pn", _sq_norm(F.col("qp")))
        .join(F.broadcast(cent.withColumn("_cvn", _sq_norm(F.col("cvec")))))
        .select("probe_id", "qp", "_pn", "cell",
                _cosine_given_norms(
                    F.col("qp"), F.col("cvec"), F.col("_pn"), F.col("_cvn")
                ).alias("ccos"))
        .withColumn("crank", F.row_number().over(cw))
        .filter(F.col("crank") <= n_probe)
        # _pn is internal plumbing — probed_cells() exposes this frame as
        # public API, so the contract is exactly (probe_id, qp, probe_cell);
        # _cell_rerank re-derives the squared norm (cheap: broadcast side,
        # one pass per probe row, not per candidate pair)
        .select("probe_id", "qp", F.col("cell").alias("probe_cell"))
    )


def _cell_rerank(corpus: DataFrame, probe_cells: DataFrame, k: int) -> DataFrame:
    """Exact cosine re-rank of corpus rows inside each probe's cells."""
    scored = corpus.withColumn("_cn", _sq_norm(F.col("qn"))).join(
        F.broadcast(probe_cells.withColumn("_pn", _sq_norm(F.col("qp")))),
        (F.col("cell") == F.col("probe_cell")) & (F.col("probe_id") != F.col("neighbor_id")),
    ).select(
        "probe_id", "neighbor_id",
        _cosine_given_norms(F.col("qp"), F.col("qn"), F.col("_pn"), F.col("_cn")).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


def ann_topk_lsh(emb: DataFrame, probes: DataFrame, id_col: str, vec_col: str,
                 k: int = 5, n_planes: int = 6, quant: int = QUANT) -> DataFrame:
    """Approximate top-k: candidates restricted to the probe's hyperplane
    bucket, exact cosine re-rank within. Same output schema as
    ``cosine_topk`` (ranks are per-probe over the candidate set)."""
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"), quantized(F.col(vec_col), quant).alias("qn")
    ).withColumn("bucket", hyperplane_bucket(F.col("qn"), n_planes)).withColumn(
        "_cn", _sq_norm(F.col("qn"))
    )
    probe_q = probes.select(
        F.col(id_col).alias("probe_id"), quantized(F.col(vec_col), quant).alias("qp")
    ).withColumn("bucket", hyperplane_bucket(F.col("qp"), n_planes)).withColumn(
        "_pn", _sq_norm(F.col("qp"))
    )
    scored = corpus.join(
        F.broadcast(probe_q),
        (corpus["bucket"] == probe_q["bucket"]) & (F.col("probe_id") != F.col("neighbor_id")),
    ).select(
        "probe_id", "neighbor_id",
        _cosine_given_norms(F.col("qp"), F.col("qn"), F.col("_pn"), F.col("_cn")).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


def ann_topk_multilsh(emb: DataFrame, probes: DataFrame, id_col: str, vec_col: str,
                      k: int = 5, n_planes: int = 6, n_tables: int = 4,
                      quant: int = QUANT) -> DataFrame:
    """Multi-table sign-LSH top-k: ``n_tables`` independent hyperplane
    families (table t = planes [t*n_planes, (t+1)*n_planes)); a corpus
    vector is a candidate if it shares a bucket with the probe in ANY
    table, then candidates dedup and re-rank by exact cosine. Same output
    schema as ``cosine_topk``.

    This is the standard recall lever sign-LSH has: per-table collision
    probability for angle θ is (1-θ/π)^p, and L tables lift recall to
    1-(1-(1-θ/π)^p)^L while the scanned fraction grows only ~L×. Measured
    recall/scanned-fraction per (p, L) on the real corpus is recorded in
    SCALE.md by scripts/ann_recall.py.

    Scale: one (table, bucket) equi-join per table — the same
    bucket-bounded shuffle as ``ann_topk_lsh``, unioned then deduped on
    (probe, neighbor); never all-pairs. The probe side (bounded by
    contract) broadcasts.
    """
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"), quantized(F.col(vec_col), quant).alias("qn")
    ).withColumn("_cn", _sq_norm(F.col("qn")))
    probe_q = probes.select(
        F.col(id_col).alias("probe_id"), quantized(F.col(vec_col), quant).alias("qp")
    ).withColumn("_pn", _sq_norm(F.col("qp")))
    cand = None
    for t in range(n_tables):
        off = t * n_planes
        c_t = corpus.withColumn("bucket", hyperplane_bucket(F.col("qn"), n_planes, off))
        p_t = probe_q.withColumn("bucket", hyperplane_bucket(F.col("qp"), n_planes, off))
        pairs = c_t.join(
            F.broadcast(p_t),
            (c_t["bucket"] == p_t["bucket"]) & (F.col("probe_id") != F.col("neighbor_id")),
        ).select("probe_id", "qp", "_pn", "neighbor_id", "qn", "_cn")
        cand = pairs if cand is None else cand.unionByName(pairs)
    deduped = cand.dropDuplicates(["probe_id", "neighbor_id"])
    scored = deduped.select(
        "probe_id", "neighbor_id",
        _cosine_given_norms(F.col("qp"), F.col("qn"), F.col("_pn"), F.col("_cn")).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


def cosine_topk_batch(emb: DataFrame, probes: DataFrame, id_col: str, vec_col: str,
                      k: int = 5, quant: int = QUANT) -> DataFrame:
    """Arrow-vectorized brute-force top-k — same answer as ``cosine_topk``,
    different physical path: the bounded probe set ships to every partition
    as a numpy int64 matrix and each ``mapInPandas`` batch scores
    probes × batch with one matmul (int64 dot/norm products are EXACT, so
    the result is bit-identical to the expression path and the same DuckDB
    oracle applies).

    Per-batch pruning keeps, per probe, the top ``k`` by unrounded cosine
    plus everything within 1.1e-6 of the k-th value — a margin wider than
    the worst movement 6-dp rounding can cause — so the final Spark-side
    re-rank (rounded cosine, id tiebreak) sees every row that could make
    the true top k. Shuffle volume: O(probes × k) per batch, never the
    corpus. This is the shape that wins at 100 TB: one Arrow transfer per
    batch, one BLAS-grade matmul, no per-row lambda interpretation.
    """
    import numpy as np
    import pandas as pd

    out_schema = "probe_id long, neighbor_id long, dot long, na long, nb long"

    probe_rows = probes.select(F.col(id_col), quantized(F.col(vec_col), quant).alias("q")).collect()
    if not probe_rows:  # empty probe set: empty answer, like cosine_topk
        empty = "probe_id long, neighbor_id long, cosine double, rank int"
        return emb.sparkSession.createDataFrame([], empty)
    p_ids = np.array([r[id_col] for r in probe_rows], dtype=np.int64)
    p_mat = np.array([r["q"] for r in probe_rows], dtype=np.int64)          # (P, D)
    p_norm = (p_mat * p_mat).sum(axis=1)                                     # (P,)
    # plain closure capture, not sparkContext.broadcast: the probe matrix
    # is small by contract and a per-call broadcast handle would leak
    # (nothing could safely destroy it while the lazy plan is alive)

    def score(batches):
        ids, mat, norms = p_ids, p_mat, p_norm
        for pdf in batches:
            if pdf.empty:
                continue
            n_ids = pdf["_nid"].to_numpy(dtype=np.int64)
            n_mat = np.array(list(pdf["_q"]), dtype=np.int64)               # (N, D)
            n_norm = (n_mat * n_mat).sum(axis=1)                            # (N,)
            dots = mat @ n_mat.T                                            # (P, N) int64 exact
            cos = dots / np.sqrt(norms[:, None].astype(np.float64) * n_norm[None, :])
            for pi in range(len(ids)):
                mask = n_ids != ids[pi]
                c = cos[pi][mask]
                if c.size == 0:
                    continue
                kth = np.sort(c)[::-1][min(k, c.size) - 1]
                keep = c >= kth - 1.1e-6
                sel = np.flatnonzero(mask)[keep]
                yield pd.DataFrame({
                    "probe_id": ids[pi],
                    "neighbor_id": n_ids[sel],
                    "dot": dots[pi][sel],
                    "na": norms[pi],
                    "nb": n_norm[sel],
                })

    corpus = emb.select(
        F.col(id_col).alias("_nid"), quantized(F.col(vec_col), quant).alias("_q")
    )
    cand = corpus.mapInPandas(score, out_schema)
    # same zero-norm convention as _cosine_given_norms: 0.0, not a
    # DIVIDE_BY_ZERO abort, when a zero vector (empty-doc embedding)
    # reaches the pair stage
    _prod = F.col("na").cast("double") * F.col("nb").cast("double")
    cosine = F.when(
        _prod > 0, F.round(F.col("dot").cast("double") / F.sqrt(_prod), 6)
    ).otherwise(F.lit(0.0))
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        cand.select("probe_id", "neighbor_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


def build_ivf_index(
    emb: DataFrame,
    out_dir: str,
    id_col: str,
    vec_col: str,
    label_col: str,
    quant: int = QUANT,
    meta_cols: list[str] | None = None,
) -> None:
    """Persist an IVF index: the quantized corpus written PARTITIONED BY
    its cell (one directory per inverted-file cell) plus the tiny centroid
    table. Indexing runs once; every later search scans only its probed
    cells' directories — the table-layout form of ``ivf_topk``'s runtime
    cell filter, and the reason IVF works at 100 TB: the search cost is
    the probed cells' bytes, not the corpus's.

    ``meta_cols`` are carried into the index rows so searches can apply
    metadata predicates (filtered vector search — see ``ivf_index_topk``'s
    ``corpus_filter``).
    """
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("cell"),
        quantized(F.col(vec_col), quant).alias("qn"),
        *[F.col(c) for c in (meta_cols or [])],
    )
    corpus.write.mode("overwrite").partitionBy("cell").parquet(f"{out_dir}/corpus")
    _cell_centroids(corpus).coalesce(1).write.mode("overwrite").parquet(
        f"{out_dir}/centroids"
    )


def probed_cells(
    spark,
    index_dir: str,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    n_probe: int = 2,
    quant: int = QUANT,
) -> DataFrame:
    """Per probe: its ``n_probe`` centroid-nearest cells (the pruning
    predicate for a persisted-index search)."""
    cent = spark.read.parquet(f"{index_dir}/centroids")
    probe_q = probes.select(
        F.col(id_col).alias("probe_id"), quantized(F.col(vec_col), quant).alias("qp")
    )
    return _rank_probe_cells(probe_q, cent, n_probe)


def ivf_index_topk(
    spark,
    index_dir: str,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_probe: int = 2,
    quant: int = QUANT,
    corpus_filter=None,
) -> DataFrame:
    """Search a persisted IVF index (``build_ivf_index``): rank cells by
    centroid cosine per probe, then scan ONLY the probed cells' partition
    directories for the exact re-rank. Result is identical to the
    in-memory ``ivf_topk`` on the same assignments (parity-tested).

    ``corpus_filter`` (an optional Column predicate over the index's
    corpus columns, e.g. a metadata column carried into the index) makes
    this FILTERED vector search: the predicate composes with the cell
    pruning — partition pruning first, then the row filter pushed into
    the pruned scan — and the top-k ranks only qualifying neighbors
    (post-filtering a wider unfiltered top-k would under-fill k).

    The probed-cell list is collected to the driver — bounded by
    |probes| x n_probe ids (the probe set is small by contract; this is
    the partition-pruning predicate, not data movement).
    """
    probe_cells = probed_cells(spark, index_dir, probes, id_col, vec_col,
                               n_probe, quant)
    cells = [r.probe_cell for r in probe_cells.select("probe_cell").distinct().collect()]
    corpus = spark.read.parquet(f"{index_dir}/corpus").filter(F.col("cell").isin(cells))
    if corpus_filter is not None:
        corpus = corpus.filter(corpus_filter)
    return _cell_rerank(corpus, probe_cells, k)


def kmeans_assign(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 5,
    quant: int = QUANT,
) -> DataFrame:
    """Deterministic Lloyd's k-means over the quantized vectors — the
    coarse quantizer that feeds ``build_ivf_index``'s cell assignment
    (its docstring's "on a real deployment"). Returns (``id_col``,
    ``cell``).

    Determinism contract (reproducible across runs AND engines):
    - init = the ``k`` lowest-``id_col`` vectors;
    - distance = squared euclidean, accumulated LEFT-TO-RIGHT over the
      dimensions (``F.aggregate`` is a sequential fold, so a plain Python
      loop reproduces the IEEE double stream bit-for-bit — pinned in
      tests);
    - argmin ties break to the lowest centroid index
      (``array_position`` finds the first minimum);
    - an emptied cell keeps its previous centroid.

    Scale: each iteration is one map-side assignment pass (k distance
    expressions inside whole-stage codegen — no shuffle) plus one
    (cell, dim) aggregation; only the k x dim centroid matrix ever
    reaches the driver. Iterations are a driver loop, the standard shape
    for fixed-iteration algorithms on Spark.
    """
    q = emb.select(F.col(id_col), quantized(F.col(vec_col), quant).alias("qn"))
    cents = _lloyd(q, id_col, k, iters)
    return _assign_to(q, cents, "cell").select(F.col(id_col), "cell")


def _assign_to(frame: DataFrame, cents: list[list[float]], out_col: str,
               qn_col: str = "qn") -> DataFrame:
    """Argmin squared-euclidean assignment of ``qn_col`` to ``cents``
    (left-to-right fold, first-minimum tie-break)."""
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col(qn_col),
                    F.array(*[F.lit(c) for c in cent]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for cent in cents
        ]
    )
    return frame.withColumn(
        out_col, (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    )


def _lloyd(q: DataFrame, id_col: str, k: int, iters: int) -> list[list[float]]:
    """The Lloyd iteration loop over (``id_col``, ``qn``) rows; returns
    the final k x dim centroid matrix (kmeans_assign's determinism
    contract applies)."""
    # materialize once: without this, every iteration (and the caller's
    # final assignment) re-scans the source and re-evaluates quantized()
    q = q.localCheckpoint(eager=True)
    cents: list[list[float]] = [
        [float(v) for v in r.qn]
        for r in q.orderBy(F.col(id_col).asc()).limit(k).collect()
    ]
    for _ in range(iters):
        sums = (
            _assign_to(q, cents, "cell")
            .select("cell", F.posexplode("qn").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in sums:
            by_cell.setdefault(r.cell, {})[r.pos] = r.s / r.c
        for j in range(k):
            if j in by_cell:  # emptied cells keep their previous centroid
                cents[j] = [by_cell[j][p] for p in sorted(by_cell[j])]
    return cents


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """Measured recall@k of an approximate top-k result against the exact
    brute-force result (same (probe_id, neighbor_id, rank) schema as the
    topk functions here): one row per probe with its |approx∩exact| / k;
    aggregate ``avg(recall)`` for the macro average.

    Evaluation is a per-probe set intersection — one equi-join on
    (probe_id, neighbor_id), no pairwise math; run it on a sampled probe
    set to monitor recall at corpus scale.
    """
    a = approx.filter(F.col("rank") <= k).select("probe_id", "neighbor_id")
    e = exact.filter(F.col("rank") <= k).select("probe_id", "neighbor_id")
    hits = (
        e.join(a, ["probe_id", "neighbor_id"], "left_semi")
        .groupBy("probe_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    per_probe = (
        e.select("probe_id").distinct()
        .join(hits, "probe_id", "left")
        .select(
            "probe_id",
            F.round(F.coalesce(F.col("n_hit"), F.lit(0)) / F.lit(k), 4).alias("recall"),
        )
    )
    return per_probe


def pq_train(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 4,
    ksub: int = 16,
    iters: int = 4,
    quant: int = QUANT,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks: the vector is split into
    ``m`` contiguous subvectors and each subspace gets its own ``ksub``
    Lloyd's codebook (same determinism contract as ``kmeans_assign``).
    Returns ``codebooks[m][ksub][dim/m]`` — driver-side, m*ksub*(dim/m)
    floats = exactly one full-dimension matrix of ksub rows, tiny at any
    corpus size.

    PQ compresses each vector to ``m`` small codes (here m bytes for
    ksub<=256): at 100 TB the encoded corpus is ~dim*4/m x smaller than
    the raw embeddings, which is what makes exhaustive ADC scans feasible.
    """
    dim = len(emb.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = []
    for j in range(m):
        sub = emb.select(
            F.col(id_col),
            quantized(F.slice(F.col(vec_col), j * dsub + 1, dsub), quant).alias("qn"),
        )
        books.append(_lloyd(sub, id_col, ksub, iters))
    return books


def pq_encode(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
    quant: int = QUANT,
) -> DataFrame:
    """Encode each vector as its per-subspace nearest-codeword indices:
    (``id_col``, ``codes`` array<int> of length m). Map-only — no shuffle."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    out = emb.select(F.col(id_col), F.col(vec_col))
    for j in range(m):
        sub_qn = quantized(F.slice(F.col(vec_col), j * dsub + 1, dsub), quant)
        out = _assign_to(out.withColumn("qn", sub_qn), codebooks[j], f"_c{j}")
    return out.select(
        F.col(id_col), F.array(*[F.col(f"_c{j}") for j in range(m)]).alias("codes")
    )


def pq_topk(
    codes: DataFrame,
    probes: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    k: int = 5,
    quant: int = QUANT,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over a PQ-encoded corpus: the probe
    keeps full precision, each corpus vector is its m codes, and the
    approximate squared distance is the sum of m table lookups
    (probe-subvector -> codeword distances).

    Spark shape: the distance tables are a |probes| x m x ksub row
    DataFrame (tiny — broadcast); the corpus explodes to m rows per
    vector, equi-joins the tables on (subspace, code), and re-sums per
    (probe, vector). Shuffle is O(corpus x m) narrow rows of ids+doubles
    — never the raw vectors, which is the entire point of PQ at scale.
    """
    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    spark = codes.sparkSession
    prows = probes.select(F.col(id_col).alias("probe_id"), F.col(vec_col)).collect()
    table_rows = []
    for pr in prows:
        vec = list(pr[vec_col])
        for j in range(m):
            sub = vec[j * dsub : (j + 1) * dsub]
            # HALF_UP away from zero — Spark F.round's rule; Python's
            # built-in round() is half-to-even and would disagree with
            # quantized() on exact .5 values
            qsub = [
                float(math.copysign(math.floor(abs(float(x) * quant) + 0.5), float(x) * quant))
                for x in sub
            ]
            for c in range(ksub):
                acc = 0.0
                for a, b in zip(qsub, codebooks[j][c]):  # left-to-right fold
                    acc = acc + (a - b) * (a - b)
                table_rows.append((pr["probe_id"], j, c, acc))
    tables = spark.createDataFrame(table_rows, "probe_id long, j int, code int, d double")

    expanded = codes.select(
        F.col(id_col).alias("neighbor_id"), F.posexplode("codes").alias("j", "code")
    )
    scored = (
        expanded.join(F.broadcast(tables), ["j", "code"])
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .groupBy("probe_id", "neighbor_id")
        .agg(F.round(F.sum("d"), 6).alias("adc_dist"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("adc_dist").asc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "adc_dist", "rank")
    )


def semdedup(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 5,
    eps: float = 0.95,
    quant: int = QUANT,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication — k-means cluster the embeddings, then inside each
    cluster drop every item that is >= ``eps`` cosine-similar to a
    lower-id item of the same cluster. Returns (``id_col``, ``cell``,
    ``keep`` boolean); downstream filters on ``keep``.

    Survivor rule (deterministic, engine-independent): an item is dropped
    iff ANY lower-id same-cell neighbor has cosine >= eps — the same
    "first occurrence wins against any earlier twin" convention as
    ``textdedup.line_dedup``. (The paper's greedy sweep re-admits an item
    whose only close neighbors were themselves dropped; that needs a
    sequential pass per cluster, and over-dropping in those rare chains
    is the conservative direction for training-data curation.)

    Scale: the only shuffle is the self-join on ``cell``; within-cell
    work is quadratic, which is SemDeDup's own cost model — pick
    ``k ~ n / target_cell_size`` so cells stay small (the paper uses
    k = 50k on ~1e8 docs for ~2k-item cells). The k-means pass itself is
    map-side assignment + one (cell, dim) agg per iteration
    (see ``kmeans_assign``); raw vectors never shuffle twice — the join
    carries the quantized arrays only inside one exchange.
    """
    q = emb.select(F.col(id_col), quantized(F.col(vec_col), quant).alias("qn"))
    cents = _lloyd(q, id_col, k, iters)
    assigned = _assign_to(q, cents, "cell")
    normed = assigned.withColumn("_n", _sq_norm(F.col("qn")))
    a = normed.select(
        F.col("cell"), F.col(id_col).alias("_a_id"),
        F.col("qn").alias("_a_qn"), F.col("_n").alias("_a_n"),
    )
    b = normed.select(
        F.col("cell"), F.col(id_col).alias("_b_id"),
        F.col("qn").alias("_b_qn"), F.col("_n").alias("_b_n"),
    )
    dropped = (
        a.join(b, "cell")
        .filter(F.col("_a_id") < F.col("_b_id"))
        .filter(
            _cosine_given_norms(
                F.col("_a_qn"), F.col("_b_qn"), F.col("_a_n"), F.col("_b_n")
            ) >= eps
        )
        .select(F.col("_b_id").alias(id_col))
        .distinct()
        .withColumn("_drop", F.lit(True))
    )
    return (
        assigned.join(dropped, id_col, "left")
        .select(
            F.col(id_col),
            F.col("cell"),
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"),
        )
    )


def diversity_sample(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    n_per_cell: int,
    k: int = 8,
    iters: int = 5,
    seed: int = 0,
    quant: int = QUANT,
) -> DataFrame:
    """Cluster-balanced (diversity) sampling: k-means the embeddings,
    then draw at most ``n_per_cell`` items from every cell by
    deterministic hash rank — the embedding-space counterpart of
    stratified sampling, used to keep a curated subset from collapsing
    onto the corpus's dense modes (the selection side of the
    SemDeDup/SSL-prototypes family: near-duplicate-heavy cells contribute
    the same budget as rare-topic cells).

    Returns the sampled rows with their ``cell`` — composition of
    ``kmeans_assign`` (deterministic Lloyd's) and the WindowGroupLimit
    fixed-N draw of ``textstats.sample_n_per_group``; both reproducible
    across runs, engines, and partitionings, re-drawable via ``seed``.

    Scale: the k-means pass is map-side assignment + one (cell, dim) agg
    per iteration; the draw is one exchange on the cell with partial
    top-n before it — at no point does anything quadratic or all-pairs
    run (unlike ``semdedup``, which pays within-cell pairs for its
    stronger guarantee).
    """
    from flinkrealtimedatawarehouse_spark.datapipeline.textstats import sample_n_per_group

    cells = kmeans_assign(emb, id_col, vec_col, k=k, iters=iters, quant=quant)
    return sample_n_per_group(emb.join(cells, id_col), ["cell"], id_col, n_per_cell, seed=seed)
