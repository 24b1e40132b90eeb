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

from pyspark.sql import DataFrame
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
