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


class SpanStateDedupSink(VersionedSnapshotSink):
    """Streaming substring-level dedup (the streaming twin of
    ``textdedup.repeated_spans``): maintains window-hash -> canonical
    (min doc_id, pos) state and appends per-doc span-coverage flags for
    every micro-batch.

    Per batch: each new doc's length-``window_n`` token windows are
    hashed with the SAME 62-bit expressions as the batch operator; a
    window occurrence (doc, pos) is marked iff the canonical occurrence
    over state ∪ batch is lexicographically smaller — so within-batch
    and cross-batch repeats are handled identically and the flags are
    invariant to how the stream is split into micro-batches. Marked
    windows merge into interval islands (shared ``merge_islands``) for
    the per-doc ``dup_windows``/``dup_coverage`` outputs. State absorbs
    the batch's windows afterwards (min (id, pos) per hash).

    Under an id-ordered replay this equals the batch ``repeated_spans``
    relation exactly; under out-of-order arrival the semantics are
    first-arrival-wins, same as ``BandStateNearDupSink``.

    State size: O(distinct window hashes of the accepted corpus) rows of
    (long, long, long) — on a cluster the same MERGE runs against a
    table partitioned by ``pmod(hash(wh), N)`` so each batch touches
    only the partitions its hashes land in. Per-batch work is one
    groupBy over the batch's windows + one equi-join against state —
    never a corpus rescan.
    """

    def __init__(self, base_dir: str, id_col: str, text_col: str,
                 window_n: int = 20, lineage: str | None = None):
        super().__init__(os.path.join(base_dir, "state"), lineage)
        self.flags_dir = os.path.join(base_dir, "flags")
        self.id_col = id_col
        self.text_col = text_col
        self.window_n = window_n

    def init(self, spark: SparkSession) -> None:
        self.snapshot_init(spark.createDataFrame(
            [], "wh long, min_id long, min_pos long"
        ))

    def state(self, spark: SparkSession) -> DataFrame:
        return self.current(spark)

    def flags(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.flags_dir).drop("_bid")

    def write_batch(self, batch: DataFrame, batch_id: int) -> None:
        if self.seen(batch_id):  # at-least-once redelivery: no-op
            return
        from flinkrealtimedatawarehouse_spark.datapipeline.hashing import spark_tokens
        from flinkrealtimedatawarehouse_spark.datapipeline.textdedup import (
            merge_islands,
            span_window_hashes,
        )

        spark = batch.sparkSession
        toks_df = batch.select(
            F.col(self.id_col), spark_tokens(F.col(self.text_col)).alias("toks")
        )
        base = toks_df.select(
            F.col(self.id_col),
            F.size("toks").alias("n_tokens"),
            F.greatest(F.size("toks") - self.window_n + 1, F.lit(0)).alias("n_windows"),
        )
        wh = span_window_hashes(toks_df, self.id_col, self.window_n)

        # canonical (min_id, min_pos) per hash over state ∪ batch: flags
        # and the new state derive from this one relation
        state = self.state(spark)
        combined = state.unionByName(
            wh.select(
                "wh",
                F.col(self.id_col).alias("min_id"),
                F.col("pos").cast("long").alias("min_pos"),
            )
        )
        new_state = (
            combined.groupBy("wh")
            .agg(F.min(F.struct("min_id", "min_pos")).alias("_c"))
            .select("wh", F.col("_c.min_id"), F.col("_c.min_pos"))
        )

        marked = (
            wh.join(new_state, "wh")
            .filter(
                (F.col("min_id") < F.col(self.id_col))
                | (
                    (F.col("min_id") == F.col(self.id_col))
                    & (F.col("min_pos") < F.col("pos"))
                )
            )
            .select(self.id_col, "pos", (F.col("pos") + self.window_n).alias("end"))
        )
        per_doc = (
            merge_islands(marked, self.id_col)
            .withColumn("_cov", F.col("_e") - F.col("_s"))
            .groupBy(self.id_col)
            .agg(F.sum("_wct").alias("dup_windows"), F.sum("_cov").alias("dup_coverage"))
        )
        out = (
            base.join(per_doc, self.id_col, "left")
            .select(
                self.id_col,
                "n_tokens",
                F.col("n_windows").cast("long").alias("n_windows"),
                F.coalesce("dup_windows", F.lit(0)).cast("long").alias("dup_windows"),
                F.coalesce("dup_coverage", F.lit(0)).cast("long").alias("dup_coverage"),
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
