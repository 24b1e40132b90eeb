"""Kafka-like file bus: a broker-free integration harness for S1/S4/K1/K2.

The container ships no Kafka broker and no spark-sql-kafka jar, so the
real ``format("kafka")`` round-trip can only run outside the sandbox
(see tests/test_sources_sinks.py's ``broker``-marked suite). This module
closes the gap in-sandbox: a file-backed topic log whose producer and
consumer go through the SAME contract functions the Kafka paths use —
``kafka_sink_options`` / ``kafka_value_projection`` on the write side,
``kafka_source_options`` / ``decode_json_value`` on the read side — so
every option and projection the reference pins
(rt/utils/MyKafkaUtil.java:18-63) is exercised source→sink→source
end-to-end, and only the transport (JSON part files vs broker TCP) is
swapped.

Wire format mirrors the Kafka connector's read schema: one JSON record
per row with ``topic``/``partition``/``offset``/``key``/``value``; the
consumer surfaces exactly what ``kafka_stream`` surfaces (a string
``value`` column), so downstream operator pipelines cannot tell the two
sources apart.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flinkrealtimedatawarehouse_spark.streaming.sinks import (
    kafka_sink_options,
    kafka_value_projection,
)
from flinkrealtimedatawarehouse_spark.streaming.sources import (
    decode_json_value,
    kafka_source_options,
)

# The kafka connector's source schema, minus binary-encoding (JSON files
# carry strings; the consumer casts value to string anyway, exactly as
# kafka_stream does for the broker's bytes).
BUS_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)


class KafkaLikeFileBus:
    """File-backed topic log with Kafka reader/writer semantics.

    One directory per topic under ``root``; each produce() appends one
    JSON part file whose records carry monotonically increasing offsets
    per (topic, partition). Consumers tail the directory with Spark's
    file stream source — append-only, replayable from offset 0
    (``startingOffsets=earliest`` semantics, which is also what every
    in-repo streaming gate needs for deterministic replay).
    """

    def __init__(self, root: str, brokers: str = "filebus:0") -> None:
        self.root = root
        self.brokers = brokers
        os.makedirs(root, exist_ok=True)

    # --- producer (K1 fixed-topic / K2 per-row topic) ---------------------

    def produce(self, df: DataFrame, checkpoint: str, topic: str | None = None) -> int:
        """Test harness only, not a production sink (the driver-side
        ``collect`` below is bounded by the test batch, never by data
        scale — production traffic goes through the real Kafka sink).

        Write a batch through the producer contract: the SAME option
        dict and value projection the Kafka sink uses. Returns rows
        written. ``topic=None`` requires a per-row ``topic`` column
        (K2); a fixed ``topic`` routes every row (K1)."""
        opts = kafka_sink_options(self.brokers, checkpoint, topic)
        assert opts["kafka.bootstrap.servers"] == self.brokers
        proj = kafka_value_projection(df)
        if topic is not None:
            proj = proj.withColumn("_t", F.lit(opts["topic"]))
        elif "topic" in proj.columns:
            proj = proj.withColumn("_t", F.col("topic"))
        else:
            raise ValueError("no topic option and no per-row topic column")
        rows = proj.select("_t", "value").collect()
        by_topic: dict[str, list[str]] = {}
        for r in rows:
            by_topic.setdefault(r["_t"], []).append(r["value"])
        for t, values in by_topic.items():
            tdir = os.path.join(self.root, t)
            os.makedirs(tdir, exist_ok=True)
            base = self._next_offset(tdir)
            recs = [
                json.dumps(
                    {"topic": t, "partition": 0, "offset": base + i, "key": None, "value": v}
                )
                for i, v in enumerate(values)
            ]
            name = f"part-{base:012d}-{len(values):06d}-{uuid.uuid4().hex[:8]}.json"
            part = os.path.join(tdir, name)
            # Stage under a DOT-prefixed name: Spark's file source ignores
            # names starting with '.'/'_', so a concurrent read_stream can
            # never list the half-written file; the visible name appears
            # only via the atomic rename. (A bare `part-*.json.tmp` name
            # WOULD be listed — the source filters on leading chars, not
            # extensions.)
            tmp = os.path.join(tdir, "." + name + ".tmp")
            with open(tmp, "w") as f:
                f.write("\n".join(recs) + "\n")
                f.flush()
                os.fsync(f.fileno())
            os.rename(tmp, part)
        return len(rows)

    def _next_offset(self, tdir: str) -> int:
        """Next offset from the part-file names alone: each visible file
        is ``part-{base:012d}-{count:06d}-{uid}.json``, so the max name's
        base+count is the log length — O(#files) listing, no re-reads
        (the old line-count-every-file scheme was O(total records ever
        written) per produce, quadratic over a long-lived topic). Legacy
        files without the count field fall back to one line count."""
        best = 0
        for p in os.listdir(tdir):
            if not (p.startswith("part-") and p.endswith(".json")):
                continue
            parts = p[len("part-"):-len(".json")].split("-")
            if not parts[0].isdigit():
                # foreign file matching the glob (manual copy, editor
                # backup): ignore it rather than poison every produce —
                # read_stream never assigns it offsets either
                continue
            base = int(parts[0])
            if len(parts) >= 3 and parts[1].isdigit():
                end = base + int(parts[1])
            else:  # pre-count-field file: count its lines once
                with open(os.path.join(tdir, p)) as f:
                    end = base + sum(1 for line in f if line.strip())
            best = max(best, end)
        return best

    # --- consumer (S1 value stream / S4 typed stream) ---------------------

    def read_stream(self, spark: SparkSession, topic: str, group_id: str) -> DataFrame:
        """S1 analog of ``kafka_stream``: subscribe via the consumer
        option contract, surface a string ``value`` column."""
        opts = kafka_source_options(self.brokers, topic, group_id, "earliest")
        assert opts["subscribe"] == topic and opts["kafka.group.id"] == group_id
        tdir = os.path.join(self.root, opts["subscribe"])
        os.makedirs(tdir, exist_ok=True)
        raw = (
            spark.readStream.schema(BUS_WIRE_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(tdir)
        )
        return raw.select(F.col("value").cast("string").alias("value"))

    def read_json_stream(
        self,
        spark: SparkSession,
        topic: str,
        group_id: str,
        schema: T.StructType,
        ts_col: str | None = None,
    ) -> DataFrame:
        """S4 analog of ``kafka_json_stream``: consumer + from_json."""
        return decode_json_value(
            self.read_stream(spark, topic, group_id), schema, ts_col
        )

    # --- batch taps (test assertions) -------------------------------------

    def read_batch(self, spark: SparkSession, topic: str) -> DataFrame:
        tdir = os.path.join(self.root, topic)
        return spark.read.schema(BUS_WIRE_SCHEMA).json(tdir)

    def topics(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
        )
