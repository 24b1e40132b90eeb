"""sf1 bench tier: deterministically amplify the sf0.1 testdata 10× into
``/root/repo/.benchdata/sf1`` (testdata itself is read-only).

Why: at sf0.1 the headline queries run in 0.14-0.9 s — fixed task-
scheduling overhead dominates and the bench can no longer detect a plan
regression smaller than ~2× on any single query. sf1 makes plans, not
overhead, the signal for the expensive queries (bench.py's extras_sf1).

Amplification preserves the scaling semantics a real 10× corpus has:

- fact/dim keys are shifted per copy with strides above each key's max,
  so every copy's FK edges stay intact and per-key densities (lines per
  order, orders per customer, events per user) are unchanged — the same
  join selectivities, 10× the rows;
- ``documents`` gets DISTINCT content per copy (a per-copy suffix token
  carrying the shifted doc_id), so dedup operators see a genuinely
  bigger corpus, not 10 trivially identical shards;
- ``embeddings`` vectors are deterministically perturbed per copy
  (±0.6% per component keyed on (vec_id, dim)), so ANN/top-k work on
  10× distinct points;
- region/nation stay fixed (they are fixed-size in TPC-H at every sf).

Deterministic end-to-end (pure column arithmetic, no RNG), idempotent
(skips when the _SF1_OK marker exists). Run standalone or let bench.py
call ``ensure_sf1`` lazily.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

AMP = 10
_BENCHDATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".benchdata")
OUT_DIR = os.path.join(_BENCHDATA, "sf1")
SF2_DIR = os.path.join(_BENCHDATA, "sf2")
SRC_DIR = "/root/testdata/sf0.1"

# strides sit above each key's sf0.1 max so copies never collide
STRIDE = {
    "order": 1_000_000,
    "cust": 100_000,
    "supp": 10_000,
    "part": 100_000,
    "doc": 100_000,
    "vec": 100_000,
    "event": 1_000_000,
    "user": 10_000,
}


def _amplified(df, shifts: dict[str, int], mutate=None, amp: int = AMP):
    """Union of ``amp`` copies; copy i shifts each key col by i*stride.
    ``mutate(copy_df, i)`` applies per-copy content changes after the
    shift."""
    parts = []
    for i in range(amp):
        c = df
        for col, stride in shifts.items():
            c = c.withColumn(col, (F.col(col) + F.lit(i * stride)).cast("long"))
        if mutate is not None:
            c = mutate(c, i)
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def ensure_sf1(spark, src_dir: str = SRC_DIR, out_dir: str = OUT_DIR) -> str:
    """Generate the sf1 dir if missing; return its path."""
    return _ensure_amplified(spark, AMP, out_dir, src_dir, "_SF1_OK")


def ensure_sf2(spark) -> str:
    """sf2 = 20x sf0.1, same construction as sf1 (strides separate the
    copies regardless of copy count). Used by the fixed-floor
    decomposition: if a query's Spark-DuckDB gap is a scheduling
    constant, it stays ~flat from sf1 to sf2 while both compute terms
    double."""
    return _ensure_amplified(spark, 2 * AMP, SF2_DIR, SRC_DIR, "_SF2_OK")


def _ensure_amplified(spark, amp: int, out_dir: str, src_dir: str,
                      marker_name: str) -> str:
    marker = os.path.join(out_dir, marker_name)
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    from flinkrealtimedatawarehouse_spark.tables import load_table

    def write(name, df):
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))

    for name in ("region", "nation"):  # fixed-size at every sf
        write(name, load_table(spark, src_dir, name))

    write("customer", _amplified(load_table(spark, src_dir, "customer"),
                                 {"c_custkey": STRIDE["cust"]}, amp=amp))
    write("supplier", _amplified(load_table(spark, src_dir, "supplier"),
                                 {"s_suppkey": STRIDE["supp"]}, amp=amp))
    write("part", _amplified(load_table(spark, src_dir, "part"),
                             {"p_partkey": STRIDE["part"]}, amp=amp))
    write("orders", _amplified(load_table(spark, src_dir, "orders"),
                               {"o_orderkey": STRIDE["order"],
                                "o_custkey": STRIDE["cust"]}, amp=amp))
    write("lineitem", _amplified(load_table(spark, src_dir, "lineitem"),
                                 {"l_orderkey": STRIDE["order"],
                                  "l_partkey": STRIDE["part"],
                                  "l_suppkey": STRIDE["supp"]}, amp=amp))
    write("events", _amplified(load_table(spark, src_dir, "events"),
                               {"event_id": STRIDE["event"],
                                "user_id": STRIDE["user"]}, amp=amp))

    def mutate_docs(c, i):
        if i == 0:
            return c.withColumn("n_chars", F.length("text").cast("long"))
        # distinct content per copy: one suffix token carrying the
        # (already shifted) doc_id — intra-copy dup structure preserved,
        # cross-copy exact dups eliminated
        return (
            c.withColumn("text", F.concat("text", F.lit(" x"), F.col("doc_id")))
            .withColumn("n_chars", F.length("text").cast("long"))
        )

    write("documents", _amplified(load_table(spark, src_dir, "documents"),
                                  {"doc_id": STRIDE["doc"]}, mutate_docs, amp=amp))

    def mutate_vecs(c, i):
        if i == 0:
            return c
        # deterministic ±0.6% per-component perturbation keyed on
        # (vec_id, dim): distinct points, same cluster geometry
        return c.withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, j: (
                    x * (1.0 + ((F.col("vec_id") * 31 + j) % 13 - 6) / 1000.0)
                ).cast("float"),
            ),
        )

    write("embeddings", _amplified(load_table(spark, src_dir, "embeddings"),
                                   {"vec_id": STRIDE["vec"]}, mutate_vecs, amp=amp))

    with open(marker, "w") as f:
        f.write("ok\n")
    return out_dir


def main() -> int:
    from flinkrealtimedatawarehouse_spark.session import get_spark

    spark = get_spark("gen-sf1")
    out = ensure_sf1(spark)
    for name in ("lineitem", "orders", "documents", "embeddings", "events"):
        n = spark.read.parquet(os.path.join(out, f"{name}.parquet")).count()
        print(f"{name}: {n} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
