"""Joins (SURVEY.md §2.4 J1-J4) + time-field/age derivations (P8/P9).

The reference's only join flavors: two keyed event-time interval joins
(order⋈detail ±5 s, rt/app/dwd/OrderWideApp.java:80-88; payment⋈order
[-15 min, 0], rt/app/dwd/PaymentWideApp.java:97-105) and per-row async
dimension lookups against Phoenix (rt/app/function/
AbstractDimAsyncFunction.java:58-91 — left-outer: rows survive a missing
dim). In Spark: interval join = equi-join + range predicate (Catalyst
executes the equi part as a hash/sort-merge join and applies the range as a
post-filter, keyed state bounded by the range in streaming); dim lookup =
broadcast left join, which replaces ~170 LoC of thread-pooled RPC code with
one exchange-free hash join per dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: tuple[str, str],
    time: tuple[str, str],
    lower: str,
    upper: str,
    how: str = "inner",
    lower_exclusive: bool = False,
    upper_exclusive: bool = False,
) -> DataFrame:
    """J1/J2: equi + time-range join.

    right.time ∈ [left.time + lower, left.time + upper], bounds inclusive
    by default (the Flink intervalJoin default; the apps all use it) with
    the same exclusivity knobs Flink exposes —
    ``exclusiveLower``/``exclusiveUpper``, demonstrated in the reference's
    join harness rtest/app/FlinkDSJoinTest.java:40-51.

    Scale: both sides shuffle on the equi key only — the range predicate
    never widens the exchange. Skewed keys fall to AQE skew-join handling.
    """
    lk, rk = key
    lt, rt = time
    lo = right[rt] > left[lt] + F.expr(f"INTERVAL {lower}") if lower_exclusive else (
        right[rt] >= left[lt] + F.expr(f"INTERVAL {lower}")
    )
    hi = right[rt] < left[lt] + F.expr(f"INTERVAL {upper}") if upper_exclusive else (
        right[rt] <= left[lt] + F.expr(f"INTERVAL {upper}")
    )
    return left.join(right, (left[lk] == right[rk]) & lo & hi, how)


def dim_enrich(
    fact: DataFrame,
    dims: list[tuple[DataFrame, object, list[str]]],
    broadcast: bool | None = None,
) -> DataFrame:
    """J3/J4: chained left joins against dimension tables — the Spark form
    of the reference's per-row async Phoenix lookups (left-outer: rows
    survive a missing dim, AbstractDimAsyncFunction.java:71-75).

    `dims` = [(dim_df, join_cond, columns_to_add)]. Order matters when a
    later dim's key comes from an earlier join's output (the reference's
    SKU→SPU/TM/Category3 chain, OrderWideApp.java:159-215) — the chain is
    applied in list order, preserving that dependency.

    ``broadcast``: True forces a broadcast hint (correct for fixed-size
    dims like region/nation), False forbids it, None (default) lets AQE
    decide from runtime sizes — the right choice for dims that scale with
    the data (customer/part at 100 TB).
    """
    out = fact
    for dim, cond, cols in dims:
        d = dim.select(*cols)
        if broadcast:
            d = F.broadcast(d)
        out = out.join(d, cond, "left")
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: tuple[str, str],
    time: tuple[str, str],
    value_cols: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of join: attach to each left row the single most recent
    right row with right.ts <= left.ts on the same key (ties match).
    ``tolerance``: interval literal (e.g. ``'10' MINUTE``) — matches older
    than left.ts - tolerance are discarded (nulls remain). Spark has no
    native as-of join; this is the union-trick form:

    union both sides tagged -> one window per key ordered by
    (ts, right-first) -> last_value(right cols, ignorenulls) carries the
    latest right payload forward onto each left row.

    Scale: ONE hash exchange on the key + in-partition sort — same cost
    as a sort-merge join, with no range-explosion (an interval-join
    formulation would multiply candidate pairs; this carries exactly one).
    A hot key serializes its partition sort, the usual salting caveat.
    """
    lk, rk = key
    lt, rt = time
    from pyspark.sql import Window

    r = right.select(
        F.col(rk).alias(lk),
        F.col(rt).alias(lt),
        F.lit(1).alias("_is_r"),
        F.col(rt).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    l = left.select(
        F.col(lk),
        F.col(lt),
        F.lit(0).alias("_is_r"),
        F.lit(None).cast(right.schema[rt].dataType).alias("_r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        *[F.col(c) for c in left.columns if c not in (lk, lt)],
    )
    u = r.unionByName(l, allowMissingColumns=True)
    # right rows sort BEFORE left rows at equal ts => at-or-before matches
    w = (
        Window.partitionBy(lk)
        .orderBy(F.col(lt).asc(), F.col("_is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        F.last("_r_ts", ignorenulls=True).over(w).alias("_m_ts"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("_is_r") == 0)
    if tolerance is not None:
        in_tol = F.col("_m_ts") >= F.col(lt) - F.expr(f"INTERVAL {tolerance}")
        matched = [F.when(in_tol, F.col(f"_m_{c}")).alias(c) for c in value_cols]
        m_ts = F.when(in_tol, F.col("_m_ts")).alias("matched_ts")
    else:
        matched = [F.col(f"_m_{c}").alias(c) for c in value_cols]
        m_ts = F.col("_m_ts").alias("matched_ts")
    keep = [c for c in left.columns if c not in (lk, lt)]
    return out.select(F.col(lk), F.col(lt), *keep, m_ts, *matched)


def range_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    chunk: float | None = None,
    how: str = "inner",
    lo_inclusive: bool = True,
    hi_inclusive: bool = False,
) -> DataFrame:
    """Band (range) join: match each fact row to every band row whose
    [lo, hi) interval contains fact.value — the IP→geo / value→tier /
    score→bucket lookup shape (beyond the reference, which only has keyed
    interval joins; same non-equi predicate family as
    rtest/app/FlinkDSJoinTest.java's windowed joins but on a value domain).

    Bounds are half-open [lo, hi) by default (standard banding: a value at
    one band's hi is the next band's lo); both ends have inclusivity knobs.
    Overlapping bands emit one row per matching band.

    Scale: a plain non-equi join has no equi key, so Catalyst can only
    pick BroadcastNestedLoopJoin (fine while the band table is small — it
    usually is) and degrades to a cartesian product when it is not.
    ``chunk`` enables the scale path: quantize the value domain into
    fixed-width cells, explode each band to the cells it overlaps
    (ceil(width/chunk) rows), stamp each fact with its single cell, and
    equi-join on the cell with the exact range predicate re-applied as a
    post-filter. The shuffle is a plain hash join on the cell key —
    O(facts + bands × width/chunk) rows, AQE/skew-handled like any
    equi-join — instead of O(facts × bands) comparisons. Pick ``chunk``
    near the median band width so most bands explode to 1-2 cells.
    """
    v = F.col(value_col)
    lo_ok = v >= F.col(lo_col) if lo_inclusive else v > F.col(lo_col)
    hi_ok = v <= F.col(hi_col) if hi_inclusive else v < F.col(hi_col)
    if chunk is None:
        return fact.join(bands, lo_ok & hi_ok, how)
    b = bands.withColumn(
        "_cell",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(chunk)),
                F.floor(F.col(hi_col) / F.lit(chunk)),
            )
        ),
    )
    f = fact.withColumn("_cell", F.floor(v / F.lit(chunk)))
    return f.join(b, (f["_cell"] == b["_cell"]) & lo_ok & hi_ok, how).drop("_cell")


def with_time_fields(df: DataFrame, time_str_col: str) -> DataFrame:
    """P8: split 'yyyy-MM-dd HH:mm:ss' into date/hour + epoch
    (OrderWideApp.java:52-63)."""
    ts = F.to_timestamp(F.col(time_str_col))
    return (
        df.withColumn("create_ts", ts)
        .withColumn("create_date", F.date_format(ts, "yyyy-MM-dd"))
        .withColumn("create_hour", F.hour(ts))
    )


def with_age(df: DataFrame, birthday_col: str, as_of=None) -> DataFrame:
    """P9: age = floor(days since birthday / 365.25)
    (OrderWideApp.java:123-131)."""
    ref = as_of if as_of is not None else F.current_date()
    return df.withColumn(
        "user_age", F.floor(F.datediff(ref, F.col(birthday_col)) / F.lit(365.25)).cast("int")
    )
