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
