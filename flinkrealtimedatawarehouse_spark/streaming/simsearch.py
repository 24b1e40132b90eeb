"""Streaming incremental top-k similarity search (EDBT'20 incremental
top-k framing, re-expressed as a foreachBatch merge).

A fixed probe set watches a growing vector corpus: each micro-batch of
new vectors can only IMPROVE a probe's top-k, never invalidate an old
neighbor — top-k under a static scoring function is monotone. So the
incremental state is exactly the current answer (k rows per probe), and
the per-batch work is: score the batch against the probes, take the
batch-local top-k, merge with the held top-k, keep k. The final state
equals the batch top-k over the full corpus REGARDLESS of how the stream
was split — which is what the driver gate checks (the stream branch of
``dp6_cosine_topk`` hashes against the same DuckDB oracle as the batch
paths).

Scale: state is O(probes × k) — independent of corpus size; per batch
the corpus side is never replicated (probe side broadcasts inside
``cosine_topk``), and the merge re-ranks O(probes × 2k) rows.
Determinism: cosine rounds at 6 dp and ties break on neighbor_id, same
as every batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkrealtimedatawarehouse_spark.datapipeline.similarity import cosine_topk
from flinkrealtimedatawarehouse_spark.streaming.snapshots import VersionedSnapshotSink


class IncrementalTopKSink(VersionedSnapshotSink):
    """foreachBatch sink holding the running top-k per probe.

    Durability/replay from VersionedSnapshotSink. Two replay defenses: the
    batch-id guard skips redelivered batches outright, and the merge
    dedups on (probe_id, neighbor_id) — a duplicate neighbor row would
    occupy ranks r AND r+1 and push the true k-th neighbor out (top-k is
    over a SET of neighbors; the duplicate carries identical values, so
    which copy survives is immaterial).
    """

    def __init__(self, base_dir: str, probes: DataFrame, id_col: str,
                 vec_col: str, k: int = 5, lineage: str | None = None):
        super().__init__(base_dir, lineage)
        self.probes = probes
        self.id_col = id_col
        self.vec_col = vec_col
        self.k = k

    def init(self, spark: SparkSession) -> None:
        self.snapshot_init(spark.createDataFrame(
            [], "probe_id long, neighbor_id long, cosine double, rank int"
        ))

    def write_batch(self, batch: DataFrame, batch_id: int) -> None:
        if self.seen(batch_id):  # at-least-once redelivery: no-op
            return
        spark = batch.sparkSession
        batch_topk = cosine_topk(
            batch, self.probes, self.id_col, self.vec_col, k=self.k
        )
        w = Window.partitionBy("probe_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        merged = (
            self.current(spark)
            .unionByName(batch_topk)
            .dropDuplicates(["probe_id", "neighbor_id"])
            .withColumn("new_rank", F.row_number().over(w))
            .filter(F.col("new_rank") <= self.k)
            .select("probe_id", "neighbor_id", "cosine",
                    F.col("new_rank").alias("rank"))
        )
        self.commit_snapshot(merged, batch_id)
