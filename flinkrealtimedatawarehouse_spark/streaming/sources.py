"""Stream sources (SURVEY.md §2.1 S1-S4, S6).

Kafka builders mirror rt/utils/MyKafkaUtil.java:43-63 (consumer with
group id + string deserialization; SQL-DDL source = same + from_json).
The container ships no Kafka broker or spark-sql-kafka jar, so these
builders construct the reader/plan but are exercised in tests only up to
plan construction; the file source in ``runner`` carries the end-to-end
streaming checks.

The CDC envelope deserializer is S3
(rt/app/function/CustomerDeserialization.java:26-72): Debezium
SourceRecord -> {database, tableName, type, before, after} with the
create->insert rename. Here it is a pure column transform usable on both
batch and streaming DataFrames of raw JSON strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- S3: CDC envelope ------------------------------------------------------

from flinkrealtimedatawarehouse_spark.schemas import CDC_ENVELOPE_SCHEMA  # noqa: E402


def parse_cdc_envelope(raw: DataFrame, json_col: str = "value") -> DataFrame:
    """S3: parse raw JSON change events into the typed envelope.

    Mirrors CustomerDeserialization.java:26-72: splits out database /
    tableName / operation / before / after, and renames the Debezium
    ``create`` op to ``insert`` (line 56-59). Unparseable rows keep a
    NULL envelope (P1's dirty-route filter applies downstream).
    """
    parsed = raw.withColumn("_env", F.from_json(F.col(json_col), CDC_ENVELOPE_SCHEMA))
    return parsed.select(
        "*",  # pass-through columns (e.g. a version/offset) survive the parse
        F.col("_env.database").alias("database"),
        F.col("_env.tableName").alias("tableName"),
        F.when(F.col("_env.type") == "create", "insert")
        .otherwise(F.col("_env.type"))
        .alias("type"),
        F.col("_env.before").alias("before"),
        F.col("_env.after").alias("after"),
    ).drop("_env")


# --- S1/S4: Kafka builders (no broker in container; plan-level only) ------
#
# Option assembly and the value->rows decode are pure functions so the
# consumer contract (the exact options MyKafkaUtil.java:18-63 pins) and
# the deserialization path are testable without a broker or the
# spark-sql-kafka jar; only `.load()` needs the jar.

def kafka_source_options(
    brokers: str,
    topic: str,
    group_id: str,
    starting_offsets: str = "latest",
) -> dict[str, str]:
    """The consumer options the reference pins (MyKafkaUtil.java:18-27,
    43-52: bootstrap servers + topic subscription + consumer group id;
    offset reset is the caller's choice as in the reference's
    ``latest``-by-default consumer)."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "kafka.group.id": group_id,
        "startingOffsets": starting_offsets,
    }


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    group_id: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1: Kafka consumer -> value-as-string stream
    (MyKafkaUtil.java:43-52, SimpleStringSchema semantics). Requires the
    spark-sql-kafka package at runtime; see module docstring."""
    raw = (
        spark.readStream.format("kafka")
        .options(**kafka_source_options(brokers, topic, group_id, starting_offsets))
        .load()
    )
    return raw.select(F.col("value").cast("string").alias("value"))


def decode_json_value(df: DataFrame, schema: T.StructType,
                      ts_col: str | None = None) -> DataFrame:
    """S4's deserialization half, usable on ANY DataFrame with a string
    ``value`` column (batch or streaming): from_json into the declared
    schema, optionally deriving an event-time column ``rt`` from epoch
    millis (TO_TIMESTAMP(FROM_UNIXTIME(ts/1000)),
    rt/app/dws/KeywordStatsApp.java:49)."""
    parsed = df.select(F.from_json("value", schema).alias("r")).select("r.*")
    if ts_col is not None:
        parsed = parsed.withColumn("rt", (F.col(ts_col) / 1000).cast("timestamp"))
    return parsed


def kafka_json_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    group_id: str,
    schema: T.StructType,
    ts_col: str | None = None,
) -> DataFrame:
    """S4: Kafka SQL-DDL source analog (MyKafkaUtil.java:54-63) — consumer
    + from_json into a declared schema."""
    return decode_json_value(
        kafka_stream(spark, brokers, topic, group_id), schema, ts_col
    )


# --- S6: test sources ------------------------------------------------------

def rate_stream(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """S6-analog deterministic-schema test source (socketTextStream in
    rtest/app/FlinkDSJoinTest.java:26-38; rate source is the Spark test
    idiom — (timestamp, value) rows)."""
    return spark.readStream.format("rate").option("rowsPerSecond", str(rows_per_second)).load()


def socket_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """S6: line stream from a socket (FlinkDSJoinTest.java:26-38)."""
    return spark.readStream.format("socket").option("host", host).option("port", str(port)).load()
