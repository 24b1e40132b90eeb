"""Dimension upsert — MERGE semantics (SURVEY.md §2.2 K3).

Reference: per-row ``upsert into GMALL_REALTIME.<sinkTable>`` against
Phoenix/HBase, SQL built by reflection over the JSON keys
(rt/app/function/DimSinkFunction.java:44-75). The Spark-native equivalent
is a keyed latest-wins MERGE applied per micro-batch; on Delta/Iceberg this
is ``MERGE INTO`` — here (parquet-only container) the same semantics as a
pure DataFrame op: union the existing snapshot with the updates and keep
the newest version of each primary key.

Scale: one shuffle on the pk; at 100 TB the dim store would be a
partitioned/bucketed table so the MERGE co-locates on the bucket — the
DataFrame shape below is unchanged, only the writer differs.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_latest(
    existing: DataFrame,
    updates: DataFrame,
    pk: str,
    version_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """MERGE: rows of ``updates`` replace same-pk rows of ``existing``;
    newest ``version_col`` wins (ties broken toward updates via a source
    rank, then ``tiebreak_col``)."""
    tagged = existing.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1)), allowMissingColumns=True
    )
    order = [F.col(version_col).desc(), F.col("_src").desc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(pk).orderBy(*order)
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def scd2_history(
    changes: DataFrame,
    pk: str,
    version_col: str,
    type_col: str | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change stream.

    The reference's dim sink keeps only the latest row per key
    (rt/app/function/DimSinkFunction.java:44-75 — Phoenix UPSERT). A
    warehouse at scale usually wants the full history instead: one row per
    accepted change, stamped ``valid_from`` (its version), ``valid_to``
    (the next change's version for the same key; NULL = still open) and
    ``is_current``. A delete (``type_col`` == 'delete') closes the open
    interval without emitting a row of its own, so a deleted key has no
    current row.

    Scale: one hash exchange on ``pk`` + per-key sort for the ``lead``
    window — the same shuffle any keyed CDC apply pays; no driver-side
    state, no data-dependent skew beyond the key distribution itself.
    """
    hist = stamp_intervals(changes, pk, version_col, type_col)
    if type_col is not None:
        hist = hist.filter(F.col(type_col) != "delete").drop(type_col)
    return hist


def stamp_intervals(
    changes: DataFrame,
    pk: str,
    version_col: str,
    type_col: str | None = None,
) -> DataFrame:
    """THE SCD2 interval stamping — shared by the batch operator above and
    the streaming ``Scd2HistorySink`` so their equivalence is structural,
    not asserted: valid_from = own version, valid_to = the key's next
    version (lead), is_current = open interval and not a delete.
    Tombstone rows are retained (callers decide whether to filter them)."""
    w = Window.partitionBy(pk).orderBy(F.col(version_col).asc())
    open_interval = F.lead(version_col).over(w).isNull()
    is_current = (
        open_interval
        if type_col is None
        else open_interval & (F.col(type_col) != "delete")
    )
    return (
        changes.withColumn("valid_from", F.col(version_col))
        .withColumn("valid_to", F.lead(version_col).over(w))
        .withColumn("is_current", is_current)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    pk: str,
    compare_cols: list[str],
) -> DataFrame:
    """Emit a CDC changelog from two dim snapshots — the inverse of
    ``apply_cdc`` (Delta's Change Data Feed produces this natively; here it
    is a plain full-outer join). Output = ``new``'s columns (old values for
    deletes) + ``change_type`` in {insert, update, delete}; unchanged rows
    are dropped.

    Scale: a single co-partitioned full-outer shuffle join on the pk; with
    bucketed snapshots (operators/scale.write_bucketed) the exchange
    disappears entirely.
    """
    if not compare_cols:
        raise ValueError("snapshot_diff needs at least one compare column")
    o = old.select(pk, *compare_cols).withColumnRenamed(pk, "_opk")
    for c in compare_cols:
        o = o.withColumnRenamed(c, f"_o_{c}")
    n = new.select(pk, *compare_cols)
    j = n.join(o, n[pk] == o["_opk"], "full_outer")
    changed = [
        ~F.col(f"_o_{c}").eqNullSafe(F.col(c)) for c in compare_cols
    ]
    diff = j.withColumn(
        "change_type",
        F.when(F.col("_opk").isNull(), "insert")
        .when(F.col(pk).isNull(), "delete")
        .otherwise("update"),
    ).filter(
        F.col("_opk").isNull()
        | F.col(pk).isNull()
        | functools.reduce(lambda a, b: a | b, changed)
    )
    # deletes carry the old values so downstream consumers see the row
    out_cols = [
        F.coalesce(F.col(pk), F.col("_opk")).alias(pk),
        *[
            F.when(F.col("change_type") == "delete", F.col(f"_o_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in compare_cols
        ],
        F.col("change_type"),
    ]
    return diff.select(*out_cols)


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    pk: str,
    version_col: str,
    type_col: str = "type",
) -> DataFrame:
    """Apply a CDC envelope stream to a dim snapshot: upserts for
    insert/update, removals for delete — the full DimSink contract
    (deletes are filtered upstream in the reference by P2; supported here
    for completeness)."""
    upserts = changes.filter(F.col(type_col) != "delete").drop(type_col)
    deletes = changes.filter(F.col(type_col) == "delete").select(F.col(pk).alias("_del_pk"))
    merged = upsert_latest(snapshot, upserts, pk, version_col)
    return (
        merged.join(F.broadcast(deletes), merged[pk] == F.col("_del_pk"), "left_anti")
        if deletes.isStreaming is False
        else merged.join(deletes, merged[pk] == F.col("_del_pk"), "left_anti")
    )


def scd2_lookup(
    facts: DataFrame,
    history: DataFrame,
    pk: str,
    at_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Temporal dim enrichment against an SCD2 history: each fact joins
    the dim version whose interval covers the fact's ``at_col``
    (valid_from <= at < valid_to; an open interval covers everything from
    its valid_from on). Facts with no covering version keep NULL attrs —
    the same left-outer contract the point-in-time dim join (J3) has.

    Scale: an equi-join on the pk with a range residual — the exact shape
    the interval join already pays; at 100 TB the history side is
    partitioned by is_current so the (dominant) current-version lookups
    read one partition.
    """
    h = history.select(
        F.col(pk).alias("_hpk"),
        F.col("valid_from").alias("_vf"),
        F.col("valid_to").alias("_vt"),
        *[F.col(c).alias(f"_a_{c}") for c in attr_cols],
    )
    cond = (
        (facts[pk] == F.col("_hpk"))
        & (facts[at_col] >= F.col("_vf"))
        & (F.col("_vt").isNull() | (facts[at_col] < F.col("_vt")))
    )
    joined = facts.join(h, cond, "left")
    return joined.select(
        *[facts[c] for c in facts.columns],
        *[F.col(f"_a_{c}").alias(c) for c in attr_cols],
    )
