"""Driver-contract query registry.

Each submodule exposes ``REGISTRY: dict[name, (fn, oracle_sql | None)]``
where ``fn(spark, sf_dir) -> DataFrame`` runs the Spark-side operator
pipeline and ``oracle_sql`` is the equivalent DuckDB SQL over the same
parquet views (None => driver records a weaker rows-only check — used only
for genuinely non-SQL-expressible streaming ops).

Column names/types are aligned on both sides (the driver sorts columns by
name and hashes values). Float outputs are rounded; integer arithmetic is
used wherever association order could drift (see datapipeline.hashing).
"""

from __future__ import annotations

from flinkrealtimedatawarehouse_spark.benchqueries import pipeline, streamq, tpch, warehouse


def full_registry():
    reg = {}
    for mod in (warehouse, tpch, pipeline, streamq):
        reg.update(mod.REGISTRY)
    return reg
