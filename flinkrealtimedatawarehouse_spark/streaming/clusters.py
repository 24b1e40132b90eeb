"""Streaming dedup-cluster upkeep: incremental connected components.

Completes the streaming near-dedup story. The pair DETECTORS already
stream (``streaming/neardup.py`` band-state ingest, dp22 gate); cluster
ASSIGNMENT — which near-dup pairs collapse to which canonical doc — was
batch-only (``textdedup.dedup_clusters``, dp19). ``ClusterUpkeepSink``
maintains the ``(id, cluster)`` label table continuously as pair batches
arrive, with the package's uniform durability contract (versioned
manifests, replay guard, writer fence, as-of time travel).

Reference provenance: the reference keeps no dup-cluster state at all —
its dedup is per-key FlatMap state with TTL (gmall-flink
rt/app/dwd/UniqueVisitApp.java:60-78, keyed is-new flags); cluster-grade
dedup is this repo's LLM-data-pipeline extension, and the streaming form
mirrors how the other gold tables are maintained (K4 additive folds, J6
wide upkeep): per micro-batch, fold the delta into a running table.

Algorithm (classic incremental CC by contraction):

1. **Contract** the batch's edges through the current label table: edge
   ``(u, v)`` becomes ``(label(u), label(v))`` with ``label(x) = x`` for
   unseen ids — a graph over cluster REPRESENTATIVES, not raw docs.
2. Run batch connected components (``textdedup.dedup_clusters``, min-label
   propagation) on that contracted graph only.
3. **Remap**: existing label rows join the contraction result on their
   CLUSTER value (members follow their representative wholesale); ids
   first seen in this batch join on their own id.

Correctness invariant (inductive): the label table always maps every
pair-touched id to the MINIMUM id reachable through all pairs seen so
far. Contracted node ids are previous cluster minima or brand-new ids,
so the contracted CC's min-label is the min over the merged component's
entire membership — exactly what a batch run over the full accumulated
pair set computes. Hence the final table equals batch
``dedup_clusters`` for ANY batch split (gate- and property-tested), and
``clusters(as_of_batch=b)`` equals a batch run over the pair PREFIX
through batch ``b`` (one commit per applied batch, same as-of contract
as the postings/IVF/wide sinks).

Scale shape: the per-batch CC runs on the CONTRACTED graph — O(batch
edges + touched clusters) label-prop work, never a recompute over all
accumulated pairs (the naive alternative is O(total pairs) per batch and
dies at stream length). Since round 12 the label table lives in a
``PartitionedSnapshotStore`` keyed on the doc id with latest-wins
merge-on-read: a commit writes ONLY the delta — rows whose cluster the
batch's remap actually changed, plus first-seen ids — so per-batch write
volume is O(|touched rows|), never O(|label table|) (the r11 verdict's
one remaining unbounded cost class, closed). The table holds one row per
pair-touched doc (the dup mass, typically a small corpus fraction);
singleton docs never enter it: ``cluster(id) = id`` is implicit for
absent ids. Reads prune too: the store is partitioned by the id hash, so
the contraction lookup and the newly-seen probe (both id-keyed) read
only the partitions the batch's endpoints hash into. The remap-membership
probe (keyed on the CLUSTER value, which lives in arbitrary id
partitions) prunes through a SECONDARY INDEX since round 13 — see
``_ClusterPidIndex`` below — closing the last O(|state|) read in the
streaming dedup DAG (VERDICT r12 task #2).

Secondary index invariant (superset semantics): whenever the label table
holds a row ``(id, c)`` at the current version, the index holds
``(c, pid(id))`` — every label delta row commits its ``(cluster, pid)``
projection to the index BEFORE the label commit, so a crash between the
two leaves the index a harmless SUPERSET (extra partitions read, never a
missed member). Stale entries — clusters merged away — are never probed
again: a cluster value is the min id of its component, components only
grow, so once ``c``'s component merges into a smaller min, no row is
ever labeled ``c`` again and no contracted-graph node ever carries it.
The index is fully derivable from the label table, so an out-of-sync
index (pre-index store upgrade, wiped dir, stale ``label_version``
stamp) is REBUILT from a one-off full scan rather than trusted.

Index GC (round 14): stale entries — clusters merged away — cost index
bytes on every member probe (the probe scans whole index partitions and
filters), and under high merge churn the index drifts toward the
full-table read it exists to avoid. The sink tracks staleness EXACTLY
and for free: ``_member_pids`` already semi-joins the index against the
batch's remapped cluster values, which are precisely the cluster values
this batch retires (a retired value never recurs — see the invariant
above — so matched index rows are live-until-now entries that the
commit makes stale). The cumulative count rides in the index's own
commit meta (replay-safe), and when the provably-stale fraction
``stale_entries / entries_ub`` crosses ``index_gc_threshold`` the sink
rebuilds the index inline — ``entries_ub`` is an UPPER bound on total
entries (exact at each rebuild + per-batch insert counts, which may
re-count duplicate (cluster, pid) inserts), so the fraction is a LOWER
bound on true staleness and the trigger errs toward rebuilding late,
never eagerly. ``index_gc_threshold=None`` disables (manual
``rebuild_index`` remains). Churn-soak measurements: SCALE.md r14.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flinkrealtimedatawarehouse_spark.streaming.partstore import (
    PartitionedSnapshotStore,
    latest_wins,
    min_merge,
)


class _ClusterPidIndex(PartitionedSnapshotStore):
    """Secondary index ``(cluster, pid)``: label-store partition ``pid``
    MAY hold rows currently labeled ``cluster``. Presence set —
    ``min_merge`` with no value columns is per-key distinct. Routed by
    the CLUSTER hash alone (``pid_expr`` override) so cluster-keyed
    probes prune index reads exactly the way id-keyed probes prune label
    reads; ``(cluster, pid)`` keys still never cross store partitions
    because the routing is a pure function of the key's cluster
    component (the fold's re-route invariant holds)."""

    def __init__(self, base_dir: str, n_partitions: int = 8,
                 lineage: str | None = None, read_only: bool = False,
                 retain_versions: int | None = None):
        super().__init__(base_dir, key_cols=["cluster", "pid"],
                         merge_fn=min_merge(["cluster", "pid"], []),
                         n_partitions=n_partitions, lineage=lineage,
                         read_only=read_only,
                         retain_versions=retain_versions)

    def pid_expr(self):
        return F.pmod(F.xxhash64("cluster"),
                      F.lit(self.n_partitions)).cast("int")


class ClusterUpkeepSink(PartitionedSnapshotStore):
    """foreachBatch writer maintaining the dedup cluster label table
    ``(id_col, cluster)`` over a stream of near-dup pairs
    ``(id_a, id_b)``. One committed version per applied batch (version 0
    is the empty init, so batch ``b``'s post-state is version ``b+1``)."""

    # Re-partitioning cutover (a long-lived stream outgrowing P): migrate
    # the label store with ``repartitioned`` into <new_dir>/labels, then
    # open a fresh ClusterUpkeepSink(new_dir, ..., n_partitions=P') —
    # the secondary index is P-dependent (it maps clusters to LABEL
    # partitions), so it is deliberately NOT migrated; the first batch's
    # _ensure_index rebuilds it under the new routing. Tested end-to-end
    # in test_streaming.test_cluster_sink_repartition_cutover.
    def __init__(self, out_dir: str, id_col: str,
                 lineage: str | None = None, read_only: bool = False,
                 retain_versions: int | None = None, max_iter: int = 50,
                 n_partitions: int = 8,
                 index_gc_threshold: float | None = 0.5):
        super().__init__(os.path.join(out_dir, "labels"),
                         key_cols=[id_col],
                         merge_fn=latest_wins([id_col], ["cluster"]),
                         n_partitions=n_partitions, lineage=lineage,
                         read_only=read_only,
                         retain_versions=retain_versions)
        self.id_col = id_col
        self.max_iter = max_iter
        # auto-GC: rebuild the index when the provably-stale entry
        # fraction crosses this (None = manual rebuild_index only)
        self.index_gc_threshold = index_gc_threshold
        self._pidx_dir = os.path.join(out_dir, "labelpidx")
        self.pidx = _ClusterPidIndex(self._pidx_dir,
                                     n_partitions=n_partitions,
                                     lineage=lineage, read_only=read_only,
                                     retain_versions=retain_versions)
        # per-batch probe stats for the scale probe: pids + manifest
        # bytes each label-table read actually scanned
        self.last_probe: dict = {}

    def write_batch(self, pairs: DataFrame, batch_id: int) -> None:
        from flinkrealtimedatawarehouse_spark.datapipeline import textdedup

        if self.seen(batch_id):
            return  # replayed batch: its pairs are already folded in
        self._check_fence()  # a fenced stale handle must fail as FENCED,
        # not trip the consecutive-feed guard below with its stale version
        spark = pairs.sparkSession
        if self.version < 0:
            self.snapshot_init(spark.createDataFrame(
                [], f"{self.id_col} long, cluster long"
            ))
        if self.pidx.version < 0:
            self.pidx.snapshot_init(
                spark.createDataFrame([], "cluster long, pid int")
            )
        if batch_id != self.version:
            # ``clusters(as_of_batch=b)`` reads version b+1, which is only
            # the post-batch-b state when batch ids arrive consecutively
            # from 0 and every batch commits (one version per applied
            # batch over the v0 init). A feed with a gap would silently
            # SHIFT every as-of read — fail loudly instead.
            raise ValueError(
                f"non-consecutive batch feed: got batch_id={batch_id}, "
                f"expected {self.version} (as-of reads require one "
                "committed version per consecutive batch id)"
            )
        edges = (
            pairs.select(F.col("id_a").cast("long"), F.col("id_b").cast("long"))
            .filter(F.col("id_a") != F.col("id_b"))
            .distinct()
        )
        # NOT checkpointed here: the composed DAG already hands us an
        # eagerly-checkpointed edge set (neardup._apply_batch), and the
        # upkeep-stream path reads a tiny parquet micro-batch — an extra
        # materialization per batch would just double the action count
        # (measured: it showed up as ~+1.5 s/batch in the dagsoak)
        # the label store is partitioned by the ID hash, so every lookup
        # KEYED ON ID prunes to the partitions the batch's endpoints hash
        # into (an id's row can live nowhere else); only the
        # remap-membership probe below (keyed on the CLUSTER value) needs
        # the full table
        ids_in_batch = edges.select(F.col("id_a").alias(self.id_col)).unionByName(
            edges.select(F.col("id_b").alias(self.id_col))
        ).distinct()
        # lazy persist (no extra action): the pruned lookup feeds THREE
        # plan legs (both contraction sides + the newly-seen anti-join),
        # and each would otherwise re-read and re-merge its runs
        lookup_pids = self.pids_of(ids_in_batch)
        labels = self.read_parts(spark, lookup_pids).persist()

        # 1. contract edge endpoints through the current labels
        la = labels.select(
            F.col(self.id_col).alias("_ia"), F.col("cluster").alias("_ca")
        )
        lb = labels.select(
            F.col(self.id_col).alias("_ib"), F.col("cluster").alias("_cb")
        )
        contracted = (
            edges.join(la, edges["id_a"] == la["_ia"], "left")
            .join(lb, edges["id_b"] == lb["_ib"], "left")
            .select(
                F.coalesce("_ca", "id_a").alias("id_a"),
                F.coalesce("_cb", "id_b").alias("id_b"),
            )
            .filter(F.col("id_a") != F.col("id_b"))  # already same cluster
            .distinct()
        )

        # 2. CC on the contracted graph only (its nodes are cluster reps
        # and first-seen ids — O(batch) work, independent of history)
        nodes = (
            contracted.select(F.col("id_a").alias(self.id_col))
            .unionByName(contracted.select(F.col("id_b").alias(self.id_col)))
            .distinct()
        )
        remap = textdedup.dedup_clusters(
            contracted, nodes, self.id_col, max_iter=self.max_iter
        ).select(F.col(self.id_col).alias("_node"), F.col("cluster").alias("_new"))

        # 3. the MERGE delta — only what this batch actually changes:
        # members of remapped clusters (they follow their representative
        # wholesale; reps whose label didn't move contribute nothing) and
        # ids first seen in this batch. The store's latest-wins merge
        # resolves them against history on read — the label table itself
        # is never rewritten.
        remap_changed = remap.filter(F.col("_node") != F.col("_new"))
        # the ONE cluster-keyed probe: members of remapped clusters live
        # in arbitrary id partitions — the secondary (cluster, pid) index
        # prunes the scan to the label partitions that can hold them
        # (superset invariant: the index commits before every label
        # commit, so it never misses a member; extra pids only cost
        # bytes). The remap side is batch-bounded, so it broadcasts and
        # nothing here shuffles the label table.
        member_pids = self._member_pids(
            spark, remap_changed.select(F.col("_node").alias("cluster"))
        )
        changed = (
            self.read_parts(spark, member_pids).join(
                F.broadcast(remap_changed),
                F.col("cluster") == remap_changed["_node"],
            )
            .select(self.id_col, F.col("_new").alias("cluster"))
        )
        newly_seen = (
            edges.select(F.col("id_a").alias(self.id_col))
            .unionByName(edges.select(F.col("id_b").alias(self.id_col)))
            .distinct()
            .join(labels, self.id_col, "left_anti")
            .join(remap, F.col(self.id_col) == remap["_node"], "left")
            .select(
                self.id_col,
                F.coalesce("_new", self.id_col).alias("cluster"),
            )
        )
        # eager checkpoint: the delta is small (touched rows only) but its
        # lineage spans the CC rounds and three joins — the commit's write
        # job must not re-derive it
        try:
            delta = changed.unionByName(newly_seen).localCheckpoint(eager=True)
        finally:
            labels.unpersist()
        # probe accounting at the PRE-commit version — the manifests the
        # three label-table reads above actually scanned (contraction +
        # newly-seen share the id-pruned read; membership is index-pruned)
        self.last_probe = {
            "lookup_pids": lookup_pids,
            "member_pids": member_pids,
            "lookup_bytes": self.state_bytes(pids=lookup_pids),
            "member_bytes": self.state_bytes(pids=member_pids),
            "state_bytes": self.state_bytes(),
            "index_bytes": (self.pidx.state_bytes()
                            if self.pidx.version >= 0 else 0),
            "index_probe_bytes": getattr(self, "_idx_probe_bytes", 0),
        }
        # index BEFORE labels: a crash between the two leaves the index a
        # superset (safe); the other order could leave it missing members
        # of committed label rows (wrong forever). On replay after such a
        # crash the index's seen() skips its (already-committed) half —
        # including the GC counters, which ride the index commit's meta
        # so they are exactly-once too.
        if not self.pidx.seen(batch_id):
            idx_delta = (
                delta.select("cluster", self.pid_expr().alias("pid"))
                .distinct()
            )
            # inserted count may re-count (cluster, pid) pairs already
            # present (the presence merge dedups them), so entries_ub is
            # an UPPER bound on total entries -> stale/ub is a LOWER
            # bound on true staleness (GC errs late, never eager)
            inserted = idx_delta.count()
            self.pidx.commit_batch(
                idx_delta, batch_id, label_version=self.version + 1,
                stale_entries=(self.pidx.meta.get("stale_entries", 0)
                               + self._stale_delta),
                entries_ub=(self.pidx.meta.get("entries_ub", 0) + inserted),
            )
        self.commit_batch(delta, batch_id)
        stale = self.pidx.meta.get("stale_entries", 0)
        ub = max(self.pidx.meta.get("entries_ub", 0), 1)
        self.last_probe["index_stale_entries"] = stale
        self.last_probe["index_entries_ub"] = ub
        self.last_probe["index_stale_frac"] = stale / ub
        if (self.index_gc_threshold is not None
                and stale / ub >= self.index_gc_threshold):
            self._rebuild_index(spark)
            self.last_probe["index_gc_rebuilt"] = True

    def _member_pids(self, spark: SparkSession,
                     clusters_df: DataFrame) -> list[int]:
        """Label partitions that can hold members of ``clusters_df``'s
        cluster values, via the secondary index. Two bounded collects
        (the package's ``.collect()`` contract): ``pids_of`` returns at
        most the index's partition count, and the pid projection at most
        the label store's. ``clusters_df`` is batch-bounded (contracted
        remap nodes), so its broadcast is small by construction."""
        self._ensure_index(spark)
        self._stale_delta = 0
        self._idx_probe_bytes = 0
        ipids = self.pidx.pids_of(clusters_df)
        if not ipids:
            return []
        # index bytes this probe scans (stale entries inflate exactly
        # this number — the churn-soak metric for the auto-GC)
        self._idx_probe_bytes = self.pidx.state_bytes(pids=ipids)
        row = (
            # merged=False: the presence-set merge (groupBy) is pointless
            # here — duplicate (cluster, pid) rows collapse in the
            # collect_set below without a second shuffle. The matched-row
            # COUNT rides the same action: the probed cluster values are
            # exactly the values this batch retires, so matched entries
            # are the ones the commit makes stale (GC accounting, free).
            self.pidx.read_parts(spark, ipids, merged=False)
            .join(F.broadcast(clusters_df.distinct()), "cluster",
                  "left_semi")
            .agg(F.count(F.lit(1)).alias("_n"),
                 F.collect_set("pid").alias("_pids"))
            .collect()[0]  # BOUNDED: one row, at most n_partitions ints
        )
        self._stale_delta = int(row["_n"])
        return sorted(int(p) for p in row["_pids"])

    def _ensure_index(self, spark: SparkSession) -> None:
        """Rebuild the secondary index when it cannot be trusted: missing
        entirely (a pre-index store upgraded in place, or a wiped dir) or
        its ``label_version`` stamp trails the label store (the stamp
        runs AHEAD by one inside the index-then-labels commit pair, so
        ``>= version`` is the in-sync test). The index is derivable, so
        rebuild-on-mismatch is the recovery contract — one full label
        scan, amortized over the store's remaining life."""
        stamped = self.pidx.meta.get("label_version", -1)
        if self.pidx.version >= 0 and stamped >= self.version:
            return
        if self.pidx.version >= 0 and self.version <= 0:
            return  # both empty: nothing to index yet
        if self.read_only:
            # a rebuild would claim the index dir and fence the live
            # writer — a read handle must never hold the write lock
            # (probes run in the writer path only, so this is a guard
            # against misuse, not a reachable state of the sink itself)
            raise RuntimeError(
                "cluster index out of sync and this is a read-only "
                "handle; rebuild must run on the writer"
            )
        self._rebuild_index(spark)

    def rebuild_index(self, spark: SparkSession) -> None:
        """Rebuild the secondary index from the label table — also the
        index's GC lever: stale entries (clusters merged away — never
        probed again, but never removed either, since the presence merge
        keeps every key) accumulate at the rate clusters merge, and a
        rebuild emits exactly the LIVE (cluster, pid) set. A deployment
        can schedule this at the same cadence as vacuum; between
        rebuilds, stale entries cost index bytes, never correctness."""
        if self.read_only:
            # same guard as _ensure_index: a rebuild rmtree's the live
            # index dir and claims its writer token — a read handle doing
            # that would fence the live writer's index
            raise RuntimeError(
                "rebuild_index must run on the writer; this is a "
                "read-only handle"
            )
        self._rebuild_index(spark)

    def _rebuild_index(self, spark: SparkSession) -> None:
        shutil.rmtree(self._pidx_dir, ignore_errors=True)
        self.pidx = _ClusterPidIndex(self._pidx_dir,
                                     n_partitions=self.n_partitions,
                                     lineage=self.lineage,
                                     retain_versions=self.retain_versions)
        self.pidx.snapshot_init(
            spark.createDataFrame([], "cluster long, pid int")
        )
        full = (
            self.current(spark)
            .select("cluster", self.pid_expr().alias("pid"))
            .distinct()
            # checkpoint so the exact-count action below and the commit's
            # write job share ONE label-table scan
            .localCheckpoint(eager=True)
        )
        # stamp with the LABEL batch cursor so replay skipping lines up:
        # the rebuilt index covers everything labels has applied. GC
        # counters reset to exact: the rebuilt set is all-live.
        self.pidx.commit_batch(full, self.last_bid,
                               label_version=self.version,
                               stale_entries=0, entries_ub=full.count())

    def clusters(self, spark: SparkSession,
                 as_of_batch: int | None = None) -> DataFrame:
        """The label table (``id_col``, ``cluster``) — current, or as it
        stood after ``as_of_batch`` committed. Ids absent from the table
        are implicit singletons (``cluster = id``)."""
        if self.version < 1:
            raise ValueError(f"cluster sink at {self.base_dir} has no commits")
        if as_of_batch is None:
            return self.current(spark)
        # version 0 = empty init; batch b's post-state committed version b+1
        return self.read_version(spark, as_of_batch + 1)


def stream_cluster_upkeep(pairs: DataFrame, id_col: str, out_dir: str,
                          n_batches: int = 4, tag: str = "clupkeep",
                          retain_versions: int | None = None,
                          staged_dir: str | None = None) -> ClusterUpkeepSink:
    """Run a near-dup pair set through cluster upkeep as a checkpointed
    stream (n_batches micro-batches, the file source standing in for the
    detector's pair topic) and return the sink. The final label table
    equals batch ``dedup_clusters`` over the same pairs — regardless of
    the batch split (the module invariant)."""
    from flinkrealtimedatawarehouse_spark.streaming import runner

    src = pairs.select("id_a", "id_b")
    in_dir = staged_dir or runner.stage_stream_dir(src, "id_a", n_batches, tag)
    sdf = runner.parquet_stream(pairs.sparkSession, in_dir, src.schema)
    sink = ClusterUpkeepSink(out_dir, id_col, retain_versions=retain_versions)
    runner.run_foreach_batch(sdf, sink.write_batch, tag)
    return sink
