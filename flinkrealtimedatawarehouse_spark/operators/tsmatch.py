"""Time-series subsequence similarity over keyed event streams (beyond
the reference; the EDBT'19 streaming-similarity theme re-expressed as
DataFrame window algebra).

Find where a query pattern occurs in each key's value series: slide a
length-|pattern| window over the ordered values, z-normalize both sides,
rank by Euclidean distance. Z-normalization makes the match amplitude-
and offset-invariant — the standard similarity model for motif/anomaly
search (UCR suite) — and a flat (zero-variance) window is given infinite
distance rather than NaN.

Everything is built-in expressions: ``collect_list`` over a bounded
row frame materializes each window (frame order follows the window's
ORDER BY), and the distance is a fold (``F.aggregate``) over the zipped
arrays — no UDF, no Python in the hot path.

Scale: one hash exchange on the key + per-key sort (the same exchange
any keyed window pays); each row carries a length-m array, so memory is
O(rows × m) per partition — for long patterns at 100 TB, chunk the
series (range-partition on time with m-overlap, the same trick as
``textstats.chunk_documents``) so no window spans a chunk boundary.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _znorm_dist(win: F.Column, pattern: list[float]) -> F.Column:
    """Euclidean distance between the z-normalized window array and the
    (pre-normalized, literal) pattern."""
    m = len(pattern)
    mean = sum(pattern) / m
    var = sum((p - mean) ** 2 for p in pattern) / m
    std = math.sqrt(var) if var > 0 else 1.0
    pat = F.array(*[F.lit((p - mean) / std) for p in pattern])

    w_mean = F.aggregate(win, F.lit(0.0), lambda a, x: a + x) / F.lit(float(m))
    w_var = (
        F.aggregate(win, F.lit(0.0), lambda a, x: a + (x - w_mean) * (x - w_mean))
        / F.lit(float(m))
    )
    w_std = F.sqrt(w_var)
    zwin = F.transform(win, lambda x: (x - w_mean) / w_std)
    sq = F.aggregate(
        F.zip_with(zwin, pat, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # zero-variance window: no shape to match — infinite distance
    return F.when(w_var > 0, F.sqrt(sq)).otherwise(F.lit(float("inf")))


def subsequence_match(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    pattern: list[float],
    k: int = 3,
    tiebreak: str | None = None,
) -> DataFrame:
    """Top-k best-matching windows per key: (key, window_start_ts, dist,
    rank). ``pattern`` must have length >= 2 (z-normalization needs a
    shape); windows shorter than the pattern (series tail) are skipped.
    """
    m = len(pattern)
    if m < 2:
        raise ValueError("pattern needs length >= 2")
    order = [F.col(ts_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    frame = (
        Window.partitionBy(key_col).orderBy(*order).rowsBetween(0, m - 1)
    )
    windowed = (
        df.withColumn("_win", F.collect_list(F.col(val_col).cast("double")).over(frame))
        .filter(F.size("_win") == m)
        .withColumn("dist", F.round(_znorm_dist(F.col("_win"), pattern), 6))
    )
    rank_w = Window.partitionBy(key_col).orderBy(
        F.col("dist").asc(), F.col(ts_col).asc()
    )
    return (
        windowed.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select(key_col, F.col(ts_col).alias("window_start"), "dist", "rank")
    )
