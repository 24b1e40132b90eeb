"""Config-driven dynamic routing (SURVEY.md §2.3 P4/P5, §2.4 J5).

Reference: the `table_process` config table is itself a CDC stream,
broadcast to every task as MapState keyed `source_table-operate_type`; each
data row looks up its key, prunes columns to `sink_columns`, and is routed
to Kafka (facts) or HBase/Phoenix (dims) with `sink_table` stamped
(rt/app/function/TableProcessFunction.java:49-177; wiring
rt/app/dwd/BaseDBApp.java:69-133).

Spark form: the config is tiny → broadcast inner join on
(tableName, type); rows with no config match drop out of the inner join —
exactly the reference's "no key in state → discard with a log"
(TableProcessFunction.java:153-155). Column pruning = `map_filter` on the
`after` payload against the split `sink_columns` CSV. The streaming
delivery (per-sink fan-out inside foreachBatch) lives in
``streaming.jobs``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def route_with_config(cdc: DataFrame, config: DataFrame) -> DataFrame:
    """Join CDC rows to the broadcast config and prune `after` to
    `sink_columns`. Output keeps the routing columns (`sink_type`,
    `sink_table`) so a downstream writer can fan out per sink."""
    cfg = config.select(
        F.col("source_table"),
        F.col("operate_type"),
        F.col("sink_type"),
        F.col("sink_table"),
        F.split(F.col("sink_columns"), ",").alias("cols"),
    )
    joined = cdc.join(
        F.broadcast(cfg),
        (cdc["tableName"] == cfg["source_table"]) & (cdc["type"] == cfg["operate_type"]),
        "inner",
    )
    return joined.withColumn(
        "after_pruned",
        F.map_filter("after", lambda k, _v: F.array_contains(F.col("cols"), k)),
    )
