"""S6/K5/K1 surface tests: rate source produces rows, console sink writer
builds and runs, Kafka builders construct plans (no broker in container —
load() needs the kafka package, so only builder-level checks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def test_kafka_consumer_options_contract():
    """S1/S4 contract: the constructed consumer carries exactly the options
    the reference pins (MyKafkaUtil.java:18-27,43-63 — bootstrap servers,
    topic subscription, consumer group id, offset reset choice)."""
    opts = sources.kafka_source_options(
        "broker1:9092,broker2:9092", "ods_base_log", "ods_dwd_base_log_app_210325",
        starting_offsets="earliest",
    )
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "ods_base_log",
        "kafka.group.id": "ods_dwd_base_log_app_210325",
        "startingOffsets": "earliest",
    }
    # default offset behavior mirrors the reference's latest-by-default
    assert sources.kafka_source_options("b:9092", "t", "g")["startingOffsets"] == "latest"


def test_kafka_producer_options_contract():
    """K1 contract: fixed destination topic as an option
    (MyKafkaUtil.java:29-33); K2 contract: NO topic option — the per-row
    ``topic`` column routes (MyKafkaUtil.java:35-41's KafkaSerializationSchema)."""
    k1 = sinks.kafka_sink_options("b:9092", "/ck/k1", topic="dwd_page_log")
    assert k1 == {
        "kafka.bootstrap.servers": "b:9092",
        "checkpointLocation": "/ck/k1",
        "topic": "dwd_page_log",
    }
    k2 = sinks.kafka_sink_options("b:9092", "/ck/k2", topic=None)
    assert "topic" not in k2 and k2["kafka.bootstrap.servers"] == "b:9092"


def test_kafka_value_projection_k1_and_k2(spark):
    """The writer's column contract: payload columns serialize into ONE
    string ``value``; K2's ``topic`` column stays TOP-LEVEL (the sink
    routes on it) and is excluded from the payload; an existing ``value``
    passes through untouched."""
    import json

    k1 = spark.createDataFrame([(1, "a")], "id long, s string")
    out1 = sinks.kafka_value_projection(k1)
    assert out1.columns == ["value"]
    assert json.loads(out1.first().value) == {"id": 1, "s": "a"}

    k2 = spark.createDataFrame(
        [("dwd_start_log", 2, "b")], "topic string, id long, s string"
    )
    out2 = sinks.kafka_value_projection(k2)
    assert out2.columns == ["topic", "value"]
    row = out2.first()
    assert row.topic == "dwd_start_log"
    assert json.loads(row.value) == {"id": 2, "s": "b"}  # topic not in payload

    pre = spark.createDataFrame([("x",)], "value string")
    assert sinks.kafka_value_projection(pre).collect() == pre.collect()


def test_decode_json_value_epoch_millis_event_time(spark):
    """S4's deserialization half runs for real on a batch frame: from_json
    into the declared schema + the reference's epoch-millis -> event-time
    derivation (KeywordStatsApp.java:49)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("keyword", T.StringType()), T.StructField("ts", T.LongType())]
    )
    df = spark.createDataFrame(
        [('{"keyword": "spark", "ts": 1609459200000}',), ("not json",)],
        "value string",
    )
    out = sources.decode_json_value(df, schema, ts_col="ts").orderBy(
        F.col("keyword").asc_nulls_last()
    )
    rows = out.collect()
    assert out.columns == ["keyword", "ts", "rt"]
    assert rows[0].keyword == "spark" and str(rows[0].rt).startswith("2021-01-01")
    # unparseable rows keep NULLs (P1's dirty route handles them downstream)
    assert rows[1].keyword is None and rows[1].rt is None


# --- KafkaLikeFileBus: broker-free source->sink->source round-trip --------
# Tier 1 of the two-tier Kafka story: the bus reuses the REAL contract
# functions (kafka_source_options / kafka_sink_options /
# kafka_value_projection / decode_json_value) end-to-end, swapping only
# the transport. Tier 2 (below, @pytest.mark.broker) runs the identical
# semantics through a real broker when KAFKA_BOOTSTRAP is set.

from pyspark.sql import types as T  # noqa: E402

from flinkrealtimedatawarehouse_spark.streaming.filebus import KafkaLikeFileBus  # noqa: E402


def _mkbus(tag: str) -> KafkaLikeFileBus:
    return KafkaLikeFileBus(runner.scratch_dir(f"bus_{tag}"))


def test_filebus_fixed_topic_roundtrip(spark):
    """K1 produce -> S1 consume: fixed topic, value projection applied,
    offsets dense from 0, replay ordered."""
    bus = _mkbus("fixed")
    df = spark.range(5).select(
        F.col("id"), F.concat(F.lit("u"), F.col("id")).alias("user")
    )
    n = bus.produce(df, runner.scratch_dir("ck_busp"), topic="events")
    assert n == 5 and bus.topics() == ["events"]
    out = runner.run_to_memory(
        bus.read_stream(spark, "events", "g1"), "bus_fixed"
    ).collect()
    assert len(out) == 5
    # value column carries the to_json projection of the full row
    import json as _json

    payloads = sorted(_json.loads(r["value"])["id"] for r in out)
    assert payloads == [0, 1, 2, 3, 4]
    # wire log: dense offsets per topic from 0
    wire = bus.read_batch(spark, "events").collect()
    assert sorted(r["offset"] for r in wire) == [0, 1, 2, 3, 4]


def test_filebus_per_row_topic_fanout(spark):
    """K2 dynamic destination: the per-row topic COLUMN routes records;
    appending a second batch continues the offset sequence."""
    bus = _mkbus("fanout")
    df = spark.createDataFrame(
        [("hot", 1), ("cold", 2), ("hot", 3)], "topic string, v int"
    )
    bus.produce(df, runner.scratch_dir("ck_busf"))
    assert bus.topics() == ["cold", "hot"]
    bus.produce(
        spark.createDataFrame([("hot", 4)], "topic string, v int"),
        runner.scratch_dir("ck_busf2"),
    )
    hot = bus.read_batch(spark, "hot").collect()
    assert sorted(r["offset"] for r in hot) == [0, 1, 2]


def test_filebus_concurrent_reader_never_sees_partials(spark):
    """A consumer listing the topic dir mid-produce must see either
    nothing or the complete batch — never a half-written file, and never
    the same record twice after the rename lands.

    Plants the exact hazard: a half-written staging file sitting in the
    topic directory (what a slow produce looks like to a concurrent
    reader), plus a stray legacy-style bare `*.json.tmp`. The dot-prefixed
    staging name is load-bearing — Spark's file source ignores only
    leading '.'/'_', not extensions — so the batch tap and the streaming
    source must both skip it, and offset assignment must not count it."""
    import json as _json

    bus = _mkbus("conc")
    bus.produce(
        spark.createDataFrame([(1,), (2,)], "id int"),
        runner.scratch_dir("ck_busc"), topic="t",
    )
    tdir = _os.path.join(bus.root, "t")
    # mid-produce snapshot: half-written dot-staged file (ours) and a bare
    # .tmp (the pre-fix naming, which Spark WOULD list as a corrupt row)
    staged = _os.path.join(tdir, ".part-000000000002-000001-deadbeef.json.tmp")
    with open(staged, "w") as f:
        f.write('{"topic": "t", "partition": 0, "offs')  # torn write
    rows = bus.read_batch(spark, "t").collect()
    assert sorted(r["offset"] for r in rows) == [0, 1]  # partial invisible
    stream = runner.run_to_memory(bus.read_stream(spark, "t", "gc"), "bus_conc")
    assert len(stream.collect()) == 2
    # offset allocation ignores the in-flight file: next batch starts at 2
    bus.produce(
        spark.createDataFrame([(3,)], "id int"),
        runner.scratch_dir("ck_busc2"), topic="t",
    )
    final = bus.read_batch(spark, "t").collect()
    assert sorted(r["offset"] for r in final) == [0, 1, 2]  # dense, no dupes
    assert sorted(_json.loads(r["value"])["id"] for r in final) == [1, 2, 3]
    _os.remove(staged)


def test_filebus_next_offset_from_names_matches_line_counts(spark):
    """The O(#files) name-derived offset equals the old count-every-line
    answer, including for a legacy file without the count field."""
    bus = _mkbus("offs")
    for batch in ([(1,), (2,), (3,)], [(4,)], [(5,), (6,)]):
        bus.produce(
            spark.createDataFrame(batch, "id int"),
            runner.scratch_dir("ck_buso"), topic="t",
        )
    tdir = _os.path.join(bus.root, "t")
    assert bus._next_offset(tdir) == 6
    # legacy two-field name (no embedded count) falls back to line-counting
    with open(_os.path.join(tdir, "part-000000000006-cafe0123.json"), "w") as f:
        f.write('{"topic": "t", "partition": 0, "offset": 6, "key": null, "value": "x"}\n')
    assert bus._next_offset(tdir) == 7


def test_filebus_typed_stream_decodes_schema(spark):
    """S4 analog: consumer + from_json into a declared schema with the
    epoch-millis rt derivation — same decode path as kafka_json_stream."""
    bus = _mkbus("typed")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("ts", T.LongType())]
    )
    src = spark.createDataFrame([(1, 1700000000000), (2, 1700000001000)], schema)
    bus.produce(src, runner.scratch_dir("ck_bust"), topic="typed")
    out = runner.run_to_memory(
        bus.read_json_stream(spark, "typed", "g2", schema, ts_col="ts"),
        "bus_typed",
    )
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["rt"] is not None and rows[2]["rt"] > rows[1]["rt"]


# --- Tier 2: real-broker suite (skips cleanly without KAFKA_BOOTSTRAP) ----
# Run outside the sandbox with:
#   KAFKA_BOOTSTRAP=host:9092 python -m pytest tests/test_sources_sinks.py -m broker
# (needs the spark-sql-kafka-0-10 package on the session classpath, e.g.
#  PYSPARK_SUBMIT_ARGS="--packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 pyspark-shell")

import os as _os  # noqa: E402

_BROKER = _os.environ.get("KAFKA_BOOTSTRAP")
needs_broker = pytest.mark.skipif(
    not _BROKER, reason="KAFKA_BOOTSTRAP not set: real-broker round-trip skipped"
)


@pytest.mark.broker
@needs_broker
def test_kafka_real_roundtrip(spark):
    """The same produce->consume semantics as the file-bus tests, through
    an actual broker: fixed-topic write via kafka_sink, value-stream read
    via kafka_stream, identical payloads back."""
    import uuid as _uuid

    topic = f"frs_it_{_uuid.uuid4().hex[:8]}"
    df = spark.range(5).select(F.col("id"))
    sdf = runner.parquet_stream(
        spark, runner.stage_stream_dir(df, "id", 1, "kbroker"), df.schema
    )
    # kafka_sink returns an un-started DataStreamWriter; availableNow
    # drains the staged batch and terminates instead of hanging forever.
    q = sinks.kafka_sink(
        sinks.kafka_value_projection(sdf), _BROKER, topic,
        runner.scratch_dir("ck_kbroker"),
    ).trigger(availableNow=True).start()
    q.awaitTermination()
    # earliest: the consumer starts AFTER the produce completed, so the
    # default `latest` would begin past the five records just written.
    got = runner.run_to_memory(
        sources.kafka_stream(spark, _BROKER, topic, "g_it", "earliest"),
        "kbroker_read",
    ).collect()
    import json as _json

    assert sorted(_json.loads(r["value"])["id"] for r in got) == [0, 1, 2, 3, 4]
