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
    rank). ``pattern`` must have length >= 2 and non-zero variance
    (z-normalization needs a shape — a constant pattern would make every
    window equidistant and the "matches" meaningless, so it raises).

    Windows shorter than the pattern are skipped — the series tail, and
    any window overlapping a NULL value (``collect_list`` drops NULLs, so
    the gapped window falls short of m and is filtered). Skipping is the
    conservative choice: stitching values across a gap would fabricate a
    continuity that isn't in the data. Pre-interpolate NULLs upstream if
    gap-bridging is wanted.
    """
    m = len(pattern)
    if m < 2:
        raise ValueError("pattern needs length >= 2")
    p_mean = sum(pattern) / m
    p_var = sum((p - p_mean) ** 2 for p in pattern) / m
    if p_var <= 0:
        raise ValueError("pattern needs non-zero variance (a constant has no shape)")
    p_std = math.sqrt(p_var)
    pat = F.array(*[F.lit((p - p_mean) / p_std) for p in pattern])

    order = [F.col(ts_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    frame = (
        Window.partitionBy(key_col).orderBy(*order).rowsBetween(0, m - 1)
    )
    # mean/var/std are hoisted into their own projections: HOF lambdas are
    # evaluated per element with no loop-invariant hoisting, so embedding
    # the O(m) mean fold inside the variance/transform lambdas would make
    # the distance O(m^2) per row
    win = F.col("_win")
    w_mean = F.col("_wmean")
    sq = F.aggregate(
        F.zip_with(
            F.transform(win, lambda x: (x - w_mean) / F.col("_wstd")),
            pat,
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    windowed = (
        df.withColumn("_win", F.collect_list(F.col(val_col).cast("double")).over(frame))
        .filter(F.size("_win") == m)
        .withColumn(
            "_wmean", F.aggregate(win, F.lit(0.0), lambda a, x: a + x) / F.lit(float(m))
        )
        .withColumn(
            "_wvar",
            F.aggregate(win, F.lit(0.0), lambda a, x: a + (x - w_mean) * (x - w_mean))
            / F.lit(float(m)),
        )
        .withColumn("_wstd", F.sqrt(F.col("_wvar")))
        .withColumn(
            "dist",
            F.round(
                # zero-variance window: no shape to match — infinite distance
                F.when(F.col("_wvar") > 0, F.sqrt(sq)).otherwise(F.lit(float("inf"))),
                6,
            ),
        )
    )
    rank_w = Window.partitionBy(key_col).orderBy(
        F.col("dist").asc(), F.col(ts_col).asc()
    )
    return (
        windowed.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select(key_col, F.col(ts_col).alias("window_start"), "dist", "rank")
    )
