"""Scale toolkit: skew salting and bucketed co-located joins.

The reference runs at parallelism 1 and never meets skew
(rt/app/dwd/UserJumpDetailApp.java:36); at the 100 TB target these are the
two knobs that decide whether a shuffle survives:

- **Salting** — a hot key (one mid/sku doing 1000x the median) makes one
  reducer the straggler. ``salted_agg`` splits every group into
  ``n_salts`` deterministic sub-groups for the wide partial aggregate and
  re-combines the partials in a second, tiny aggregate; the heavy exchange
  spreads over n_salts reducers. ``salted_broadcast_join`` handles the
  join flavor: explode the broadcast side once per salt so a skewed probe
  side still distributes. (AQE's skew-join split — enabled in session.py —
  covers sort-merge joins at runtime; explicit salting is for aggregates
  and for plans AQE can't rewrite.)
- **Bucketing** — two tables bucketed on the join key with the same bucket
  count join with ZERO exchange: each task reads matching bucket files
  from both sides. ``write_bucketed``/``bucketed_join`` demonstrate the
  contract; the test suite asserts the physical plan contains no shuffle
  on the bucketed sides. At 100 TB this is how fact<->fact co-location
  avoids re-shuffling petabytes per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``measures`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max} (the decomposable aggregates; avg = sum/count
    at the call site). ``salt_source``: column whose hash spreads the
    group (defaults to the first measure input — any non-constant column
    works; determinism of the RESULT never depends on the salt).
    """
    src = salt_source or next(iter(measures.values()))[0]
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(src)), F.lit(n_salts)))

    partial_aggs, final_aggs = [], []
    for out, (col, fn) in measures.items():
        p = f"_p_{out}"
        if fn == "count":
            partial_aggs.append(F.count(F.lit(1)).alias(p))
            final_aggs.append(F.sum(p).alias(out))
        elif fn == "sum":
            partial_aggs.append(F.sum(col).alias(p))
            final_aggs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_aggs.append(F.min(col).alias(p))
            final_aggs.append(F.min(p).alias(out))
        elif fn == "max":
            partial_aggs.append(F.max(col).alias(p))
            final_aggs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"non-decomposable agg {fn!r}; use sum/count/min/max")
    wide = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return wide.groupBy(*keys).agg(*final_aggs)


def salted_broadcast_join(
    skewed: DataFrame,
    dim: DataFrame,
    key: tuple[str, str],
    n_salts: int = 16,
    how: str = "left",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-safe dim join: the probe side gets a deterministic row-salt,
    the (small) dim side is exploded once per salt value and broadcast —
    every reducer sees an even slice of even the hottest key. Result ==
    plain join (salt columns are internal).

    The salt hashes ``salt_cols`` (default: every HASHABLE probe column —
    map columns are excluded, ``xxhash64`` rejects MapType), so it is
    stable across runs and repartitionings — safe to surface in output or
    checkpointed state. Rows identical in all salt_cols share a salt; a
    hot key still spreads as long as its rows differ in any hashed column
    — pass a unique id column as ``salt_cols`` when the probe side can
    carry fully-identical duplicate rows."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    def _hashable(dt) -> bool:
        # xxhash64 rejects MapType ANYWHERE in the type tree
        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return _hashable(dt.elementType)
        if isinstance(dt, StructType):
            return all(_hashable(f.dataType) for f in dt.fields)
        return True

    sk, dk = key
    if salt_cols is None:
        salt_cols = [f.name for f in skewed.schema.fields if _hashable(f.dataType)]
        if not salt_cols:
            raise ValueError("no hashable probe columns for the salt; pass salt_cols")
    salt_src = [F.col(c) for c in salt_cols]
    probe = skewed.withColumn("_salt", F.pmod(F.xxhash64(*salt_src), F.lit(n_salts)))
    dim_x = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = probe.join(F.broadcast(dim_x), (probe[sk] == dim_x[dk]) & (probe["_salt"] == dim_x["_salt"]), how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 8,
) -> None:
    """Persist as a bucketed+sorted managed table (Delta/Iceberg would use
    their clustering; parquet bucketing carries the same contract).
    Idempotent: drops the table and any orphaned location first (a prior
    session's metadata dies with it, but the warehouse files persist)."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = warehouse.removeprefix("file:") + "/" + table.lower()
    shutil.rmtree(loc, ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_key)
        .sortBy(bucket_key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: tuple[str, str],
    how: str = "inner",
    force_smj: bool = False,
) -> DataFrame:
    """Join two co-bucketed tables — with matching bucket specs Spark
    plans a SortMergeJoin with NO shuffle on either side: each task zips
    matching bucket files. ``force_smj`` adds a MERGE hint so small test
    tables don't fall back to broadcast (where bucketing is moot)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    if force_smj:
        lt, rt = lt.hint("merge"), rt.hint("merge")
    lk, rk = key
    return lt.join(rt, lt[lk] == rt[rk], how)
