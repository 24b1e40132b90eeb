"""S6/K5/K1 surface tests: rate source produces rows, console sink writer
builds and runs, Kafka builders construct plans (no broker in container —
load() needs the kafka package, so only builder-level checks)."""

from __future__ import annotations

import pytest

from flinkrealtimedatawarehouse_spark.streaming import runner, sinks, sources


def test_rate_source_produces_rows(spark):
    sdf = sources.rate_stream(spark, rows_per_second=100)
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("rate_t")
        .option("checkpointLocation", runner.scratch_dir("ck_rate"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 20
        while spark.table("rate_t").count() == 0 and time.time() < deadline:
            time.sleep(0.5)
        assert spark.table("rate_t").count() > 0
        assert set(spark.table("rate_t").columns) == {"timestamp", "value"}
    finally:
        q.stop()


def test_console_sink_runs(spark, capfd):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    in_dir = runner.stage_stream_dir(df, "id", 1, "console")
    sdf = runner.parquet_stream(spark, in_dir, df.schema)
    q = (
        sinks.console_sink(sdf)
        .option("checkpointLocation", runner.scratch_dir("ck_console"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_kafka_sink_builder_shapes_value(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    in_dir = runner.stage_stream_dir(df, "id", 1, "kafkab")
    sdf = runner.parquet_stream(spark, in_dir, df.schema)
    # builder materializes a to_json(value) projection + kafka writer; the
    # container has no kafka package, so only builder construction runs
    w = sinks.kafka_sink(sdf, "localhost:9092", "t", runner.scratch_dir("ck_kb"))
    assert w is not None


def test_kafka_source_builder_requires_package(spark):
    # plan construction hits the DataSource lookup; without the
    # spark-sql-kafka package this raises — gate it as the expected path
    with pytest.raises(Exception):
        sources.kafka_stream(spark, "localhost:9092", "t", "g").printSchema()
