"""Table layout for scan pruning (the write-side half of 100 TB reads).

Predicate pushdown only pays when the physical layout lets the reader
skip data. Two mechanisms, both free at write time:

- **Partition pruning** (directory level): ``partitionBy(date_col)`` at
  write -> a reader filtering on the partition column never lists, opens,
  or decodes the other directories. This is the coarse knife: at 100 TB a
  day-partitioned events table turns a one-day query from a full scan
  into ~1/365th of the data, before a single byte is read.
- **Min/max (row-group) pruning** (file level): ``repartitionByRange`` +
  ``sortWithinPartitions`` on the secondary filter column clusters values
  so each parquet file/row-group covers a narrow range; the reader drops
  whole files/groups on their min-max statistics. Without the clustering
  the same statistics exist but span the full domain per file — nothing
  prunes.

The reference has no table-layout story (its serving store is ClickHouse,
whose ORDER BY key plays the same role — SURVEY.md §2.9); this module is
the Spark-native equivalent for the parquet/Delta lakehouse the engine
writes.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_clustered(
    df: DataFrame,
    out_dir: str,
    partition_cols: list[str],
    cluster_col: str | None = None,
    n_files: int | None = None,
) -> None:
    """Write ``df`` partitioned by ``partition_cols`` (directory pruning)
    and, if ``cluster_col`` is given, range-clustered + sorted on it
    within each partition (min/max file pruning).

    The range repartition keys on (partition_cols, cluster_col) so rows of
    one partition land together and are split into roughly equal
    ``cluster_col`` ranges; the within-partition sort tightens each
    written file's min-max envelope. ``n_files`` is the TOTAL range-bucket
    count across all partitions; when omitted it defaults to the session's
    shuffle parallelism (no extra pass over the data — sizing the file
    count from row/byte statistics is the caller's job, or set
    ``spark.sql.files.maxRecordsPerFile`` and let the writer split).
    """
    if cluster_col is not None:
        if n_files is None:
            n_files = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        keys = [F.col(c) for c in partition_cols] + [F.col(cluster_col)]
        df = df.repartitionByRange(max(n_files, 1), *keys).sortWithinPartitions(*keys)
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(out_dir)


def _file_bytes(spark: SparkSession, files: list[str]) -> int:
    """Total size of the given file URIs via the Hadoop FileSystem API —
    scheme-agnostic (file:, hdfs:, s3a:, ...), unlike os.path on stripped
    URIs which silently reports 0 for any remote filesystem."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    total = 0
    for f in files:
        p = jvm.org.apache.hadoop.fs.Path(f)
        fs = p.getFileSystem(hconf)
        total += fs.getFileStatus(p).getLen()
    return total


def compact_dir(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
    cluster_col: str | None = None,
) -> dict:
    """Bin-pack a small-file table into ~``target_file_bytes`` files.

    Streaming sinks and frequent micro-batch appends leave thousands of
    KB-scale files per partition; at 100 TB the scan then pays a metadata
    list + open + footer read per file and loses row-group pruning (one
    tiny row group each). Compaction = read -> re-bucket to
    ceil(bytes/target) -> rewrite; with ``cluster_col`` the rewrite also
    re-sorts (re-establishing min-max envelopes that append order
    destroyed). Writes to ``out_path`` (atomic swap/replace is the table
    format's job — Delta OPTIMIZE; on raw parquet the caller swaps dirs).

    File sizes come from the Hadoop FileSystem API, so sizing works on
    any scheme (local, HDFS, S3A), and the (compressed) input bytes are a
    slight UNDER-estimate of rewrite size only where compression ratios
    change — close enough for bin-packing.

    Shapes:
    - unpartitioned: ``coalesce(n)`` — merging files needs no shuffle;
    - ``partition_cols`` without ``cluster_col``: hash-repartition on the
      partition columns so each partition value lands in ONE task and
      writes ONE file per directory (not tasks × partitions splinters; a
      partition bigger than the target is still one file — pass
      ``cluster_col`` to split oversized partitions by range instead);
    - with ``cluster_col``: range-repartition + sort on
      (partition_cols..., cluster_col) — n range buckets total, big
      partitions split across buckets, envelopes restored.

    Returns {files_before, files_after, bytes_total}.
    """
    df = spark.read.parquet(path)
    files = df.inputFiles()
    bytes_total = _file_bytes(spark, files)
    n_out = max(1, math.ceil(bytes_total / target_file_bytes))
    if cluster_col is not None:
        keys = [F.col(c) for c in (partition_cols or [])] + [F.col(cluster_col)]
        df = df.repartitionByRange(n_out, *keys).sortWithinPartitions(*keys)
    elif partition_cols:
        df = df.repartition(n_out, *[F.col(c) for c in partition_cols])
    else:
        # coalesce, not repartition: merging files needs no shuffle
        df = df.coalesce(n_out)
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(out_path)
    return {
        "files_before": len(files),
        "files_after": len(spark.read.parquet(out_path).inputFiles()),
        "bytes_total": bytes_total,
    }


def zorder_value(cols: list, bits: int = 16) -> F.Column:
    """Z-order (Morton) interleave of N numeric columns — ONE cluster key
    that preserves locality in EVERY input dimension, so range-clustering
    on it lets min-max pruning work for predicates on any of the columns
    (single-column sort prunes only its own column; the columns sorted
    after it are shuffled within each prefix and their envelopes span the
    full domain).

    Each column must already be scaled to a non-negative integer rank in
    [0, 2^bits) — use ``ntile``/``percent_rank`` or a linear rescale
    first; interleaving raw skewed values wastes bits. Out-of-range
    values are masked to their low ``bits`` bits (aliasing — adjacent
    ranks may collide, clustering degrades gracefully instead of a
    negative value's sign bits corrupting every interleave position).
    Pure JVM bit arithmetic (shifts/masks via bitwise expressions), no
    UDF: bit j of column i lands at position ``j * n_cols + i``.

    bits * n_cols must stay <= 63 (the result is a signed long).
    """
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"bits*n_cols = {bits * n} exceeds a signed long")
    mask = F.lit((1 << bits) - 1)
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        v = (F.col(c) if isinstance(c, str) else c).cast("long").bitwiseAND(mask)
        for j in range(bits):
            bit = F.shiftright(v, j).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, j * n + i))
    return out


def _scan_metrics(node, metrics: dict) -> None:
    """Accumulate numFiles/numPartitions from a physical-plan node tree,
    descending through AdaptiveSparkPlanExec (a LeafExecNode wrapper whose
    real subtree hangs off executedPlan())."""
    if node.nodeName() == "AdaptiveSparkPlan":
        _scan_metrics(node.executedPlan(), metrics)
        return
    leaves = node.collectLeaves()
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        if leaf.nodeName() == "AdaptiveSparkPlan":
            _scan_metrics(leaf.executedPlan(), metrics)
            continue
        m = leaf.metrics()
        for key in ("numFiles", "numPartitions"):
            opt = m.get(key)
            if opt.isDefined():
                metrics[key] = metrics.get(key, 0) + opt.get().value()


def scan_report(spark: SparkSession, path: str, predicate: str) -> dict:
    """Execute a filtered read of ``path`` and report what the scan
    actually touched: the FileSourceScan's ``numPartitions``/``numFiles``
    metrics AFTER partition pruning, against the table's totals.
    (``DataFrame.inputFiles()`` lists the pre-pruning FileIndex and cannot
    show pruning — the runtime scan metrics are the ground truth.) The
    assertion material for layout tests and plan audits."""
    full = spark.read.parquet(path)
    filtered = full.filter(predicate)
    filtered.collect()  # execute THIS plan so its scan metrics populate
    plan_j = filtered._jdf.queryExecution().executedPlan()
    metrics: dict[str, int] = {}
    _scan_metrics(plan_j, metrics)
    plan = plan_j.toString()
    return {
        "n_files_total": len(full.inputFiles()),
        "n_files_scanned": metrics.get("numFiles", -1),
        "n_partitions_scanned": metrics.get("numPartitions", -1),
        "plan_has_partition_filters": "PartitionFilters: [" in plan
        and not plan.split("PartitionFilters: [", 1)[1].startswith("]"),
        "plan": plan,
    }
