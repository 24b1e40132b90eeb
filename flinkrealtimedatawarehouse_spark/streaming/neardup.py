"""Streaming near-duplicate detection: MinHash-LSH band state over a
document stream (north-star LLM-ingest operator; the streaming twin of
``datapipeline.textdedup.minhash_near_dups``).

A batch near-dedup pass over a 100 TB corpus is a full re-shuffle of every
document's band keys. An INGEST pipeline can't afford that per increment:
new documents must be checked against everything already accepted, in one
pass, touching only state proportional to the accepted corpus's band
keys. That is this operator:

- per micro-batch, compute each new doc's MinHash signature and its
  ``bands`` LSH band keys (identical expressions to the batch operator —
  ``hashing.py`` — so batch and stream agree bit-for-bit);
- a document is flagged ``is_near_dup=1`` iff any of its band keys is
  already held by a document with a SMALLER doc_id — previously arrived,
  or earlier within the same batch (the min is computed over state ∪
  batch, so the flag is invariant to how the stream is split into
  micro-batches);
- the band-key state (one row per distinct band key: the minimum doc_id
  that ever claimed it) absorbs the batch's keys afterwards.

Under an id-ordered replay this produces exactly the directional batch
relation "doc d is a near-dup candidate iff some d' < d shares a band" —
which is what the DuckDB oracle checks. Under out-of-order arrival the
semantics are first-arrival-wins (a late small id does not retroactively
re-flag an already-emitted doc) — the only causally possible online
semantics, and the flags remain deterministic for a fixed arrival order.

State size: O(distinct band keys) ~ O(accepted docs × bands) rows of
(int, string, long) — compact enough to snapshot per batch at test scale;
on a cluster the same MERGE runs against a Delta table partitioned by
``pmod(hash(band_key), N)`` so each micro-batch touches only the
partitions its keys hash into. The per-batch work is one groupBy over the
batch's band keys + one equi-join against state — never a corpus scan.

Candidate flags are LSH-level (no Jaccard verify stage): the streaming
contract is "cheap online filter, exact offline verify" — chain
``textdedup.jaccard_verify`` over the flagged pairs offline when the
band-collision false-positive rate matters.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flinkrealtimedatawarehouse_spark.datapipeline.textdedup import (
    lsh_band_rows,
    minhash_signatures,
)
from flinkrealtimedatawarehouse_spark.streaming.snapshots import VersionedSnapshotSink


class BandStateNearDupSink(VersionedSnapshotSink):
    """foreachBatch sink: maintains the band-key -> min-doc-id state and
    appends per-doc ``is_near_dup`` flags for every micro-batch.

    Durability/replay from VersionedSnapshotSink (state snapshots live
    under ``base_dir/state``). The state fold (min per band key) is
    idempotent and flags use per-``_bid`` dynamic overwrite, so a
    redelivered batch would be harmless anyway — the batch-id guard just
    skips the wasted work.
    """

    def __init__(self, base_dir: str, id_col: str, text_col: str,
                 shingle_n: int = 3, k: int = 16, bands: int = 8,
                 lineage: str | None = None):
        super().__init__(os.path.join(base_dir, "state"), lineage)
        self.flags_dir = os.path.join(base_dir, "flags")
        self.id_col = id_col
        self.text_col = text_col
        self.shingle_n = shingle_n
        self.k = k
        self.bands = bands

    def init(self, spark: SparkSession) -> None:
        self.snapshot_init(spark.createDataFrame(
            [], "band_idx int, band_key string, min_id long"
        ))

    def state(self, spark: SparkSession) -> DataFrame:
        return self.current(spark)

    def flags(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.flags_dir).drop("_bid")

    # -- per-batch ---------------------------------------------------------
    def write_batch(self, batch: DataFrame, batch_id: int) -> None:
        if self.seen(batch_id):  # at-least-once redelivery: no-op
            return
        spark = batch.sparkSession
        sigs = minhash_signatures(
            batch, self.id_col, self.text_col, self.shingle_n, self.k
        )
        rows_per_band = self.k // self.bands
        band_rows = lsh_band_rows(sigs, self.id_col, self.bands, rows_per_band)

        # min doc id per band key over state ∪ batch: the flag and the new
        # state both derive from this one relation, so within-batch and
        # cross-batch duplicates are handled identically.
        state = self.state(spark)
        combined = state.unionByName(
            band_rows.select(
                "band_idx", "band_key", F.col(self.id_col).alias("min_id")
            )
        )
        new_state = combined.groupBy("band_idx", "band_key").agg(
            F.min("min_id").alias("min_id")
        )

        flagged = (
            band_rows.join(new_state, ["band_idx", "band_key"])
            .groupBy(self.id_col)
            .agg(
                F.max((F.col("min_id") < F.col(self.id_col)).cast("int")).alias(
                    "is_near_dup"
                )
            )
        )
        # docs with too few tokens never produce band rows -> never dups
        out = (
            batch.select(self.id_col)
            .join(flagged, self.id_col, "left")
            .select(
                self.id_col,
                F.coalesce("is_near_dup", F.lit(0)).alias("is_near_dup"),
                F.lit(batch_id).alias("_bid"),
            )
        )
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_bid")
            .parquet(self.flags_dir)
        )
        self.commit_snapshot(new_state, batch_id)
