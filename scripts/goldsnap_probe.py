"""Round-15 probe (VERDICT r14 #4): price the AdditiveGoldSink
complete-snapshot-per-version write as |gold| grows.

The wide-gold sink rewrites the FULL running table every micro-batch —
the priced r11-r13 design buying zero-merge O(1)-version reads (the
0.09-0.18 s wide point lookups in the serving tier). This probe puts
numbers on the trade so the decision is measured, not asserted:

1. ``synthetic`` mode: drive the sink with batches of K fresh keys each,
   so |gold| grows K per batch; record per-batch commit wall + snapshot
   bytes. The slope of wall vs |gold| IS the O(|gold|) term; the
   intercept is the per-action floor.
2. ``wide <sf_dir>`` mode: run the real wide upkeep build and split each
   batch's wall into (bounds first(), snapshot commit action) so the
   build-tier entry's composition is attributable.

Feeds the GOLDSNAP table in SCALE.md. Run from the repo root:
``python scripts/goldsnap_probe.py synthetic [keys_per_batch] [n_batches]``
``python scripts/goldsnap_probe.py wide [sf_dir] [n_batches]``
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for name in files:
            total += os.path.getsize(os.path.join(root, name))
    return total


def synthetic(spark, per_batch: int, n_batches: int) -> None:
    from flinkrealtimedatawarehouse_spark.streaming.runner import scratch_dir
    from flinkrealtimedatawarehouse_spark.streaming.sinks import AdditiveGoldSink

    out = scratch_dir("goldsnap")
    sink = AdditiveGoldSink(
        out, keys=["k"], measures={"amt": ("v", "sum"), "ct": ("v", "count")}
    )
    print("batch | gold_keys | commit_s | snapshot_MB")
    for b in range(n_batches):
        batch = spark.range(b * per_batch, (b + 1) * per_batch).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
        t0 = time.time()
        sink.write_batch(batch, b)
        wall = time.time() - t0
        vb = _dir_bytes(os.path.join(out, f"v{sink.version}"))
        print(f"{b:5d} | {(b + 1) * per_batch:9d} | {wall:8.3f} | "
              f"{vb / 1e6:11.2f}")


def wide(spark, sf_dir: str, n_batches: int) -> None:
    from flinkrealtimedatawarehouse_spark import serving
    from flinkrealtimedatawarehouse_spark.streaming import sinks as ssinks
    from flinkrealtimedatawarehouse_spark.streaming.runner import scratch_dir

    commits: list[float] = []
    orig = ssinks.VersionedSnapshotSink.commit_snapshot

    def timed_commit(self, df, batch_id, **meta):
        t0 = time.time()
        orig(self, df, batch_id, **meta)
        commits.append(time.time() - t0)

    ssinks.VersionedSnapshotSink.commit_snapshot = timed_commit
    try:
        out = scratch_dir("goldsnap_wide")
        staged = serving.stage_wide_input(spark, sf_dir, n_batches=n_batches,
                                          tag="goldsnap")
        t0 = time.time()
        sink = serving.stream_wide_product_upkeep(
            spark, sf_dir, out, n_batches=n_batches, tag="goldsnap",
            staged_dir=staged)
        total = time.time() - t0
    finally:
        ssinks.VersionedSnapshotSink.commit_snapshot = orig
    sizes = {v: _dir_bytes(os.path.join(out, f"v{v}"))
             for v in sink.versions()}
    n_keys = sink.current(spark).count()
    print(f"build wall {total:.3f}s over {n_batches} batches; "
          f"commit actions: {[round(c, 3) for c in commits]} "
          f"(sum {sum(commits):.3f}s = {100 * sum(commits) / total:.0f}% of wall)")
    print(f"gold keys {n_keys}; per-version snapshot MB: "
          f"{ {v: round(b / 1e6, 2) for v, b in sizes.items()} }")


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "synthetic"
    from flinkrealtimedatawarehouse_spark.session import get_spark

    spark = get_spark("goldsnap-probe")
    if mode == "synthetic":
        per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 250_000
        n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 8
        synthetic(spark, per_batch, n_batches)
    elif mode == "wide":
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
        n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 4
        wide(spark, sf_dir, n_batches)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
