"""Model-based quality filtering: an in-engine linear (logistic)
classifier over hashed text features — the CCNet/fastText-style quality
gate real LLM data pipelines run between heuristic rules and training
(Wenzek et al. 2020 "CCNet"; the LLaMA corpus filter).

Reference scope note: the reference system (Flink gmall warehouse) has no
ML surface at all — this module exists for the LLM-data-pipeline mandate,
not for parity.

Spark shape:
- features are the deterministic ``textstats.embed_text`` hashing-trick
  vectors (map-only, JVM-only) or any ``array<double>`` column;
- TRAINING is full-batch gradient descent: each iteration is ONE
  aggregation producing the d+1 gradient sums (zip_with inside the agg —
  no explode, no shuffle wider than the partial-agg tree), with the
  current weights broadcast as literals. The driver holds only the d+1
  weight vector — the same bounded driver-loop class as k-means/BPE
  (one job per iteration, documented in SCALE.md).
- SCORING is a map-only sigmoid fold — a free extra projection on any
  pass that already reads the features.

Determinism caveat (honest): the gradient is a float sum over rows, so
bit-identical weights across partitionings are NOT guaranteed (unlike the
integer-quantized paths elsewhere); training is deterministic given a
fixed partitioning, and the parity test against a plain-Python reference
uses tolerances, not hashes. Scores for a FIXED weight vector are pure
per-row functions and fully deterministic.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot_w(vec_col, w: list[float]):
    """w·x + b as a literal-weight fold (w[-1] is the bias)."""
    expr = F.lit(float(w[-1]))
    for i, wi in enumerate(w[:-1]):
        expr = expr + F.lit(float(wi)) * F.element_at(vec_col, i + 1)
    return expr


def train_logreg(
    df: DataFrame,
    feat_col: str,
    label_col: str,
    dim: int,
    n_iter: int = 60,
    lr: float = 1.0,
    l2: float = 0.0,
) -> list[float]:
    """Full-batch logistic regression: returns ``dim`` weights + bias as
    a plain list (broadcastable; persist it anywhere). Labels must be
    0/1. Fixed iteration count — no early-stop data dependence.

    Each iteration: margin = sigmoid(w·x) - y per row (JVM expressions),
    then one aggregate of d+1 products — gradient rows never leave the
    executors, only the d+1 sums reach the driver.

    The (features, label) projection is persisted ONCE up front and
    released in a ``finally`` (same discipline as minhash_near_dups):
    without it, every one of the n_iter aggregates re-executes the full
    upstream lineage — for embed_text features that is n_iter
    re-tokenizations of the corpus.
    """
    from pyspark.storagelevel import StorageLevel

    df = df.select(feat_col, label_col).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n = df.count()  # materializes the cache
        if n == 0:
            raise ValueError("empty training frame")
        w = [0.0] * (dim + 1)
        for _ in range(n_iter):
            margin = (
                F.lit(1.0) / (F.lit(1.0) + F.exp(-_dot_w(F.col(feat_col), w)))
                - F.col(label_col).cast("double")
            ).alias("_m")
            grads = df.withColumn("_m", margin).agg(
                *[
                    F.sum(F.col("_m") * F.element_at(feat_col, i + 1)).alias(f"g{i}")
                    for i in range(dim)
                ],
                F.sum("_m").alias("gb"),
            )
            row = grads.first()
            g = [row[f"g{i}"] / n for i in range(dim)] + [row["gb"] / n]
            w = [wi - lr * (gi + l2 * wi) for wi, gi in zip(w, g)]
        return w
    finally:
        df.unpersist()


def score_logreg(df: DataFrame, feat_col: str, w: list[float],
                 out_col: str = "quality_prob") -> DataFrame:
    """Map-only scoring: ``out_col`` = sigmoid(w·x) in [0, 1]."""
    return df.withColumn(
        out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-_dot_w(F.col(feat_col), w)))
    )


def filter_by_quality(df: DataFrame, feat_col: str, w: list[float],
                      threshold: float = 0.5) -> DataFrame:
    """The quality gate: keep rows the classifier scores >= threshold."""
    return score_logreg(df, feat_col, w).filter(F.col("quality_prob") >= threshold)


def train_logreg_reference(rows: list[tuple[list[float], int]], dim: int,
                           n_iter: int = 60, lr: float = 1.0,
                           l2: float = 0.0) -> list[float]:
    """Plain-Python twin of ``train_logreg`` (same updates, sequential
    fold) for parity tests."""
    n = len(rows)
    w = [0.0] * (dim + 1)
    for _ in range(n_iter):
        g = [0.0] * (dim + 1)
        for x, y in rows:
            m = 1.0 / (1.0 + math.exp(-(sum(wi * xi for wi, xi in zip(w[:-1], x)) + w[-1]))) - y
            for i in range(dim):
                g[i] += m * x[i]
            g[-1] += m
        g = [gi / n for gi in g]
        w = [wi - lr * (gi + l2 * wi) for wi, gi in zip(w, g)]
    return w
