"""Streaming heavy hitters: mergeable Misra-Gries summaries over a
keyed stream (beyond the reference: its top-N queries re-aggregate the
full gold table per request — exact, but state is O(distinct keys),
which at 100 TB of URLs/tokens/user-agents does not fit anywhere).

Batch-merge Misra-Gries (the mergeable-summaries formulation): keep at
most ``m`` (key, count) counters. Per micro-batch, fold the batch's
EXACT counts additively into the counters; if more than ``m`` keys
survive, subtract the (m+1)-th largest count from every counter and drop
the non-positive ones. Guarantees after any number of merges over a
stream of n items:

- every reported count UNDER-estimates its true count by at most the sum
  of the decrements D, and D <= n / (m + 1);
- therefore every key with true frequency > n/(m+1) is present in the
  summary (a true heavy hitter can never be evicted);
- the summary is a pure function of the multiset seen so far — the same
  stream in any micro-batch split yields counters within the same error
  envelope, and in the EXACT regime (distinct keys <= m, no decrement
  ever fires) the counts equal a batch groupBy().count() exactly.

Scale: state is O(m) rows regardless of key cardinality. The per-batch
work is one groupBy over the batch plus a full-outer fold against m
rows; the (m+1)-th-largest selection runs on m+batch_keys rows, never
the corpus. For sharded operation at cluster scale, run one summary per
``pmod(hash(key), S)`` shard and merge the S summaries at read — the
decrement bound adds across shards (also from the mergeable-summaries
result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flinkrealtimedatawarehouse_spark.streaming.snapshots import VersionedSnapshotSink


class MisraGriesSink(VersionedSnapshotSink):
    """foreachBatch sink holding an m-counter Misra-Gries summary.

    Durability/replay from VersionedSnapshotSink (snapshot-then-marker,
    restart recovery, at-least-once batch-id guard — a redelivered batch
    must NOT double-fold, or estimates would over-count and break the
    central guarantee). ``total_decrement`` is carried in the COMMITTED
    MARKER, not the counter rows: a reduction can evict every counter
    (all counts equal the pivot), and a per-row decrement would vanish
    with the rows, silently shrinking the reported error envelope.
    ``current()`` stamps it back onto the rows for readers.
    """

    def __init__(self, base_dir: str, key_cols: list[str], m: int = 100,
                 lineage: str | None = None):
        super().__init__(base_dir, lineage)
        self.key_cols = key_cols
        self.m = m

    def init(self, spark: SparkSession, key_schema: str) -> None:
        """``key_schema``: DDL for the key columns, e.g. ``"k string"``."""
        self.snapshot_init(
            spark.createDataFrame([], f"{key_schema}, count_est long")
        )

    def current(self, spark: SparkSession) -> DataFrame:
        """(keys..., count_est, total_decrement): for every reported key,
        true_count - total_decrement <= count_est <= true_count."""
        return super().current(spark).withColumn(
            "total_decrement", F.lit(int(self.meta.get("total_decrement", 0)))
        )

    def write_batch(self, batch: DataFrame, batch_id: int) -> None:
        if self.seen(batch_id):  # at-least-once redelivery: no-op
            return
        spark = batch.sparkSession
        state = VersionedSnapshotSink.current(self, spark)
        prev_decrement = int(self.meta.get("total_decrement", 0))
        batch_counts = batch.groupBy(*self.key_cols).agg(
            F.count(F.lit(1)).cast("long").alias("b_ct")
        )
        a, b = state.alias("a"), batch_counts.alias("b")
        cond = [a[k].eqNullSafe(b[k]) for k in self.key_cols]
        folded = a.join(b, cond, "full_outer").select(
            *[F.coalesce(a[k], b[k]).alias(k) for k in self.key_cols],
            (
                F.coalesce(a["count_est"], F.lit(0))
                + F.coalesce(b["b_ct"], F.lit(0))
            ).alias("count_est"),
        )
        # Misra-Gries reduction: if > m counters, subtract the (m+1)-th
        # largest count from all and keep the positive remainder. offset(m)
        # on a count-desc sort gives that pivot; an empty tail means no
        # reduction. Driver-side single value — the frame is at most
        # m + |batch keys| rows, never the corpus.
        pivot_row = (
            folded.orderBy(F.col("count_est").desc())
            .offset(self.m)
            .select("count_est")
            .head(1)
        )
        d = pivot_row[0][0] if pivot_row else 0
        reduced = folded.withColumn(
            "count_est", F.col("count_est") - F.lit(d)
        ).filter(F.col("count_est") > 0)
        self.commit_snapshot(
            reduced, batch_id, total_decrement=prev_decrement + d
        )
