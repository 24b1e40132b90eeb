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
