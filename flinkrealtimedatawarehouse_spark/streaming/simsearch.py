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

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkrealtimedatawarehouse_spark.datapipeline.similarity import cosine_topk


class IncrementalTopKSink:
    """foreachBatch sink holding the running top-k per probe.

    Versioned parquet snapshots under ``base_dir`` (snapshot written
    FIRST, version pointer bumped after — a failed write leaves the
    previous consistent answer and the retry overwrites the orphan).
    """

    def __init__(self, base_dir: str, probes: DataFrame, id_col: str,
                 vec_col: str, k: int = 5):
        self.base_dir = base_dir
        self.probes = probes
        self.id_col = id_col
        self.vec_col = vec_col
        self.k = k
        self.version = -1

    def _path(self, v: int) -> str:
        return os.path.join(self.base_dir, f"v{v}")

    def init(self, spark: SparkSession) -> None:
        self.version = 0
        empty = spark.createDataFrame(
            [], "probe_id long, neighbor_id long, cosine double, rank int"
        )
        empty.write.mode("overwrite").parquet(self._path(0))

    def current(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self._path(self.version))

    def write_batch(self, batch: DataFrame, _batch_id: int) -> None:
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
            .withColumn("new_rank", F.row_number().over(w))
            .filter(F.col("new_rank") <= self.k)
            .select("probe_id", "neighbor_id", "cosine",
                    F.col("new_rank").alias("rank"))
        )
        merged.write.mode("overwrite").parquet(self._path(self.version + 1))
        self.version += 1
