"""Multi-stream unions feeding the DWS wide tables (SURVEY.md §2.8 U1-U3).

Reference: VisitorStats is the union of 3 normalized streams (pv/uv/uj —
rt/app/dws/VisitorStatsApp.java:60-126) and ProductStats the union of 7
(click/display/favor/cart/order/payment/refund —
rt/app/dws/ProductStatsApp.java:83-258); each source stream is projected
onto the full stat row with zeros for the measures it doesn't carry, then
the union is key+window aggregated with plain sums.

Spark form: ``align_union`` builds the zero-filled projections and chains
``unionByName``; the downstream tumble-sum is one hash agg. Scale: the
union is a zero-shuffle narrow op; the single exchange is the groupBy —
same topology as the reference's keyBy after union. U3 (match+timeout
union) needs no union at all here: the ``lead()`` bounce rewrite
(operators/bounce.py) emits both cases from one expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WINDOW_FMT = "yyyy-MM-dd HH:mm:ss"


def align_union(
    streams: list[tuple[DataFrame, dict[str, Column]]],
    keys: list[str],
    ts_col: str,
    measures: list[str],
) -> DataFrame:
    """Normalize each (df, provided-measures) onto keys+ts+all-measures with
    typed zeros for the missing ones, then union by name."""
    out: DataFrame | None = None
    for df, provided in streams:
        cols = [F.col(k) for k in keys] + [F.col(ts_col).alias(ts_col)]
        for m in measures:
            cols.append((provided[m] if m in provided else F.lit(0)).cast("double").alias(m))
        proj = df.select(*cols)
        out = proj if out is None else out.unionByName(proj)
    assert out is not None, "align_union needs at least one stream"
    return out


def fused_union_agg(
    df: DataFrame,
    branches: list[tuple[Column, dict[str, Column]]],
    keys: list[str],
    ts_col: str,
    measures: list[str],
    duration: str,
) -> DataFrame:
    """ONE-SCAN rewrite of align_union + tumble_sum for the case the
    reference can't have: all N streams derive from the SAME table by
    filters. The union form plans N column-pruned scans — each pushes its
    predicate, but a predicate on a randomly-distributed column (e.g.
    event_type) prunes no parquet row groups, so N scans decode the data
    N times. The fused form is one scan + one conditional aggregation:
    measure m = sum over branches providing m of CASE WHEN cond THEN expr
    ELSE 0 — a row in k branches contributes to k measures, exactly its k
    union copies. Group membership = rows matching ANY branch.

    Result-identical to the union form (the u2 gate entry hashes both
    paths against one oracle); at 100 TB it reads the facts once instead
    of N times. Use the union form when sources are genuinely distinct
    (different topics/tables); use this when they're filters of one scan.
    """
    from functools import reduce as _reduce
    from operator import or_ as _or

    base = df.filter(_reduce(_or, (c for c, _ in branches)))
    totals: dict[str, Column] = {}
    for cond, provided in branches:
        for m, expr in provided.items():
            # coalesce the expr: a NULL measure value contributes nothing in
            # the union form (sum skips that copy, zero-filled copies keep
            # the sum non-NULL) — without it, NULL + other-branch-term
            # would poison the row's ENTIRE per-measure contribution
            term = F.when(cond, F.coalesce(expr.cast("double"), F.lit(0.0))).otherwise(F.lit(0.0))
            totals[m] = term if m not in totals else totals[m] + term
    aggs = [
        F.round(F.sum(totals.get(m, F.lit(0.0))), 2).alias(m) for m in measures
    ]
    return (
        base.groupBy(F.window(F.col(ts_col), duration), *keys)
        .agg(*aggs)
        .select(
            F.date_format(F.col("window.start"), WINDOW_FMT).alias("stt"),
            F.date_format(F.col("window.end"), WINDOW_FMT).alias("edt"),
            *keys,
            *measures,
        )
    )


def tumble_sum(
    unioned: DataFrame,
    keys: list[str],
    ts_col: str,
    measures: list[str],
    duration: str,
) -> DataFrame:
    """The post-union keyed tumble reduce (VisitorStatsApp.java:133-188):
    sum every measure, stamp stt/edt (W2)."""
    aggs = [F.round(F.sum(m), 2).alias(m) for m in measures]
    return (
        unioned.groupBy(F.window(F.col(ts_col), duration), *keys)
        .agg(*aggs)
        .select(
            F.date_format(F.col("window.start"), WINDOW_FMT).alias("stt"),
            F.date_format(F.col("window.end"), WINDOW_FMT).alias("edt"),
            *keys,
            *measures,
        )
    )
