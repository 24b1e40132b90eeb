"""Mergeable distinct-count sketches (beyond the reference's operator set).

The reference computes exact distincts with merged per-window HashSets
(rt/bean/ProductStats.java:107-117, merged in ProductStatsApp.java:265-313)
— exact and fine for bounded 10 s windows, but a serving layer that needs
the same distinct at MULTIPLE grains (sku -> category -> day) must either
re-scan the facts per grain or give up exactness. HyperLogLog sketches are
the 100 TB answer: aggregate once at the finest grain, then roll up by
UNIONING sketches — no second scan, bounded error, and the union is exact
over the sketch algebra (union-of-sketches == sketch-of-union, a property
the tests assert as strict equality of estimates).

Spark 4 ships the Apache DataSketches HLL family as built-ins
(hll_sketch_agg / hll_union_agg / hll_sketch_estimate), so the whole
rollup stays JVM-side inside codegen; shuffle volume is one ~2^lgk-byte
sketch per fine-grain group, independent of row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def uv_sketch_fine(
    events: DataFrame,
    dims: list[str],
    user_col: str,
    lgk: int = 12,
) -> DataFrame:
    """One HLL sketch per fine-grain group: ``dims + [uv_sketch]``.
    This is the only pass over the raw facts; every coarser grain derives
    from its output via :func:`uv_sketch_rollup`."""
    return events.groupBy(*dims).agg(F.hll_sketch_agg(user_col, F.lit(lgk)).alias("uv_sketch"))


def uv_sketch_rollup(
    fine: DataFrame,
    dims: list[str],
) -> DataFrame:
    """Roll sketches up to a coarser grain: union the fine sketches and
    estimate. ``dims`` must be a subset of the fine grain's dims. Output:
    ``dims + [uv_est]`` (bigint estimate). All fine sketches share one
    lgConfigK (set in uv_sketch_fine), so the union needs no
    allowDifferentLgConfigK."""
    return fine.groupBy(*dims).agg(
        F.hll_sketch_estimate(F.hll_union_agg("uv_sketch")).alias("uv_est")
    )


def uv_estimate(fine: DataFrame, dims: list[str]) -> DataFrame:
    """Estimates at the fine grain itself: ``dims + [uv_est]``."""
    return fine.select(*dims, F.hll_sketch_estimate("uv_sketch").alias("uv_est"))


# --- mergeable histogram quantiles ----------------------------------------

def histogram_bins(df: DataFrame, value_col: str, width: float,
                   group_cols: list[str] | None = None) -> DataFrame:
    """Fixed-width histogram counts: one row per (group..., bin). The
    counts are ADDITIVE — fold them incrementally micro-batch by
    micro-batch (AdditiveGoldSink with a count measure keyed on the bin)
    and the running histogram equals the batch histogram; state is
    O(range/width) rows per group regardless of stream length. The
    bounded-state streaming answer to "value distribution so far", where
    an exact percentile would need every value retained.
    """
    keys = (group_cols or []) + ["bin"]
    return (
        # NULL values carry no position in the distribution — without the
        # filter they'd form a NULL bin that sorts first in the cumulative
        # window and shifts every quantile toward the low end
        df.filter(F.col(value_col).isNotNull())
        .withColumn("bin", F.floor(F.col(value_col) / F.lit(float(width))).cast("long"))
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("bin_ct"))
    )


def quantiles_from_histogram(hist: DataFrame, width: float, qs: list[float],
                             group_cols: list[str] | None = None) -> DataFrame:
    """Read-side quantile estimates from fixed-width bin counts: for each
    q, the smallest bin whose cumulative count reaches q*total, estimated
    at that bin's upper edge — error is bounded by one bin width, by
    construction, against the exact percentile of the underlying values.
    One window over O(bins) rows per group; never touches raw values.
    """
    if not qs:
        raise ValueError("qs must name at least one quantile")
    gc = group_cols or []
    w_cum = Window.partitionBy(*gc).orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_tot = Window.partitionBy(*gc)
    cum = hist.withColumn("cum", F.sum("bin_ct").over(w_cum)).withColumn(
        "total", F.sum("bin_ct").over(w_tot)
    )
    # all quantiles in ONE pass: explode the q list against the cumulative
    # rows (a per-q filter/union loop would re-execute the hist lineage and
    # both windows once per quantile)
    return (
        cum.crossJoin(
            F.broadcast(
                cum.sparkSession.createDataFrame([(q,) for q in qs], "q double")
            )
        )
        .filter(F.col("cum") >= F.col("q") * F.col("total"))
        .groupBy(*gc, "q")
        .agg(F.min("bin").alias("qbin"))
        .select(*gc, "q", ((F.col("qbin") + 1) * F.lit(float(width))).alias("q_est"))
    )
