"""Event-time type robustness: the driver-generated parquet has shipped
``events.ts`` as TIMESTAMP(NANOS) (reads as bigint under the legacy conf)
and as timestamp[us] (reads as TIMESTAMP_NTZ in Spark 4) across rounds —
the engine must produce identical results from every shape.
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import functions as F

from flinkrealtimedatawarehouse_spark import tables
from flinkrealtimedatawarehouse_spark.operators import bounce, sessions
from flinkrealtimedatawarehouse_spark.timeutil import epoch_seconds

# smallest sf next to whatever tree the env points at
SF = os.path.join(
    os.path.dirname(tables.DEFAULT_SF_DIR.rstrip("/")), "sf0.001"
)


def _ntz_events(spark):
    """A small events frame whose ts is genuinely TIMESTAMP_NTZ."""
    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 10, "view"),
        (2, datetime(2024, 1, 1, 0, 0, 3), 10, "view"),      # entry 3s after entry
        (3, datetime(2024, 1, 1, 0, 0, 5), 10, "click"),     # continuation
        (4, datetime(2024, 1, 1, 0, 1, 0), 11, "view"),      # lone entry
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )


def test_load_table_normalizes_event_time_to_ltz(spark):
    ev = tables.load_table(spark, SF, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert "timestamp_ntz" not in {t for _, t in ev.dtypes}


def test_epoch_seconds_agrees_across_ts_types(spark):
    ntz = _ntz_events(spark)
    ltz = ntz.withColumn("ts", F.col("ts").cast("timestamp"))
    num = ltz.withColumn("ts", F.col("ts").cast("double"))
    vals = [
        sorted(r[0] for r in df.select(epoch_seconds(df, "ts")).collect())
        for df in (ntz, ltz, num)
    ]
    assert vals[0] == vals[1] == vals[2]


def test_mark_bounces_runs_on_ntz_timestamps(spark):
    marked = bounce.mark_bounces(
        _ntz_events(spark), "user_id", "ts",
        F.col("event_type") == "view", 10, tiebreak="event_id",
    )
    got = {r["event_id"]: r["is_bounce"] for r in marked.collect()}
    # e1: next is another entry within 10s -> CEP match -> bounce
    # e2: next is a continuation within 10s -> pattern dies -> not a bounce
    # e4: no next event -> timeout -> bounce
    assert got == {1: 1, 2: 0, 4: 1}


def test_sessionize_runs_on_ntz_timestamps(spark):
    s = sessions.session_stats(_ntz_events(spark), "user_id", "ts", 10, tiebreak="event_id")
    rows = {(r["user_id"], r["session_idx"]): (r["n_events"], r["dur_sec"]) for r in s.collect()}
    assert rows == {(10, 0): (3, 5.0), (11, 0): (1, 0.0)}
