"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join rollup on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the LLM-data-pipeline operators, each wired to the
driver's testdata tables with an exact DuckDB oracle (rows-only entries —
no oracle — are limited to genuinely non-SQL-expressible streaming forms).

The registry lives in ``flinkrealtimedatawarehouse_spark.benchqueries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flinkrealtimedatawarehouse_spark.benchqueries import full_registry
from flinkrealtimedatawarehouse_spark.benchqueries.warehouse import q_j4


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: orders -> customer -> nation -> region dim chain
    (J3/J4) + revenue rollup, on /root/testdata/sf0.001."""
    return q_j4(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ datapipeline)."""
    return {name: fn for name, (fn, _sql) in full_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle for each query (omitted => rows-only check)."""
    return {name: sql for name, (_fn, sql) in full_registry().items() if sql is not None}
