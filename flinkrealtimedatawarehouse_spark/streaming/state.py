"""Keyed-state streaming operators (T5/T7 + streaming A5/W1).

``streaming_dedup`` is the UV dedup (rt/app/dwd/UniqueVisitApp.java:52-90):
first event per (key, day) passes, duplicates drop; the reference's 24 h
state TTL becomes watermark-driven state eviction.

``bounce_stream`` is the CEP bounce state machine
(rt/app/dwd/UserJumpDetailApp.java:54-108) as an
``applyInPandasWithState`` operator with event-time timeouts (T7):

- per key (mid), buffer incoming page events in group state;
- an entry event e (empty last_page_id) is *decidable* once the watermark
  passes ``e.ts + gap`` — at that point every event that could precede
  e's true successor has arrived (later-arriving older rows would be
  late-dropped), so the strict-next rule evaluates exactly:
  bounce unless the next event exists, is a continuation (non-entry),
  and arrived within ``gap`` seconds;
- decided entries are emitted and evicted; buffered events older than the
  decision horizon are evicted with them, so state per key is bounded by
  ``gap + delay`` seconds of events regardless of stream length — the
  same bound Flink's CEP ``within(10s)`` + 1 s watermark gives.

This emit-on-watermark discipline makes the operator deterministic on
replay: output = pure function of (data, gap, delay), letting the DuckDB
oracle reproduce it with a lead() + final-watermark-cutoff query even
though the operator itself is arbitrary stateful code.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    grain: str = "day",
    delay: str = "25 hours",
) -> DataFrame:
    """Streaming A5/T5: watermark-evicted first-per-key-per-grain pass-through.

    Emits the key columns of the first-seen row per (key, event-time grain).
    Rows emit immediately (streaming dedup is append-on-arrival); the
    watermark exists purely for STATE EVICTION, mirroring the reference's
    24 h keyed-state TTL (rt/app/dwd/UniqueVisitApp.java:52-90): the event
    time is truncated to ``grain``, watermarked with ``delay``, and included
    in the dropDuplicates subset — Spark only evicts dedup state when the
    watermarked column is among the subset keys, so state is bounded to
    ~``delay``/``grain`` grains of keys regardless of stream length.

    Output is projected to the key columns so the result is
    order-insensitive (which physical row of a dup-group survives a given
    batch split is not part of the contract, the key set is).
    """
    grain_ts = "__grain_ts"
    prepared = events.withColumn(
        grain_ts, F.date_trunc(grain, F.col(ts_col))
    ).withWatermark(grain_ts, delay)
    return (
        prepared.select(*key_cols, grain_ts)
        .dropDuplicates(key_cols + [grain_ts])
        .select(*key_cols)
    )


def streaming_dedup_within_watermark(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    delay: str = "24 hours",
) -> DataFrame:
    """TTL-style streaming dedup via ``dropDuplicatesWithinWatermark`` —
    the closest one-call match to the reference's 24 h OnCreateAndWrite
    keyed-state TTL (rt/app/dwd/UniqueVisitApp.java:66-70): state for a
    key is dropped once the watermark passes delay beyond the FIRST
    sighting, so a re-visit more than ``delay`` later emits again.

    Contrast with ``streaming_dedup``: there the dedup horizon is a fixed
    calendar grain (one row per key per day, Flink's state cleared at a
    boundary); here it is a sliding TTL from first sight (one row per key
    per ``delay``-length quiet period). Both keep state bounded by the
    watermark; which matches depends on whether the product metric is
    calendar UV or session-ish uniqueness.
    """
    return (
        events.withWatermark(ts_col, delay)
        .select(*key_cols, ts_col)
        .dropDuplicatesWithinWatermark(key_cols)
        .select(*key_cols)
    )


BOUNCE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("is_bounce", T.IntegerType()),
    ]
)

_BOUNCE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("event_id", T.ArrayType(T.LongType())),
        T.StructField("is_entry", T.ArrayType(T.IntegerType())),
    ]
)


def _bounce_fn(gap_s: int):
    # gap comparisons run at full microsecond precision (the data has µs
    # timestamps); the decidability cutoff runs at ms because Spark tracks
    # event-time stats (and hence the watermark) in milliseconds.
    gap_us = gap_s * 1_000_000

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            ts_us, ev_id, is_entry = state.get
            ts_us, ev_id, is_entry = list(ts_us), list(ev_id), list(is_entry)
        else:
            ts_us, ev_id, is_entry = [], [], []

        if not state.hasTimedOut:
            for pdf in pdfs:
                # pandas datetime64[ns] -> int64 ns -> µs
                ts_us.extend((pdf["ts"].astype("int64") // 1_000).tolist())
                ev_id.extend(pdf["event_id"].astype("int64").tolist())
                is_entry.extend(pdf["ie"].astype("int32").tolist())

        wm_us = state.getCurrentWatermarkMs() * 1_000

        # canonical order: (ts, event_id) — the tiebreak the batch lead()
        # uses (operators/bounce.py)
        order = sorted(range(len(ts_us)), key=lambda i: (ts_us[i], ev_id[i]))
        ts_us = [ts_us[i] for i in order]
        ev_id = [ev_id[i] for i in order]
        is_entry = [is_entry[i] for i in order]

        out_uid, out_eid, out_b = [], [], []
        undecided_us = None
        for i in range(len(ts_us)):
            if not is_entry[i]:
                continue
            if ts_us[i] + gap_us < wm_us:
                # decidable: true successor (if any) has arrived
                if i + 1 < len(ts_us):
                    gap_ok = ts_us[i + 1] - ts_us[i] < gap_us
                    bounce = 0 if (gap_ok and not is_entry[i + 1]) else 1
                else:
                    bounce = 1  # timeout: no successor within gap (T7)
                out_uid.append(user_id)
                out_eid.append(ev_id[i])
                out_b.append(bounce)
            elif undecided_us is None:
                undecided_us = ts_us[i]

        # evict everything that can no longer be the successor of an
        # undecided entry (decided entries always precede undecided ones,
        # so they are always evicted — no double emission on replay)
        horizon = undecided_us if undecided_us is not None else wm_us
        keep = [i for i in range(len(ts_us)) if ts_us[i] >= horizon]
        if keep:
            state.update((
                [ts_us[i] for i in keep],
                [ev_id[i] for i in keep],
                [is_entry[i] for i in keep],
            ))
            if undecided_us is not None:
                # Spark fires when timeoutTimestamp < watermark (strict);
                # tts = floor_ms(ts) + gap_ms makes "fires" ⇔ the µs
                # decidability predicate ts_us + gap_us < wm_us (wm is
                # ms-granular), so emission matches the oracle exactly
                state.setTimeoutTimestamp(undecided_us // 1_000 + gap_s * 1_000)
        else:
            state.remove()

        yield pd.DataFrame({"user_id": out_uid, "event_id": out_eid, "is_bounce": out_b})

    return fn


def bounce_stream(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    entry_pred=None,
    gap_s: int = 300,
    delay: str = "30 seconds",
) -> DataFrame:
    """Streaming W1: bounce detection with event-time timeouts.

    ``entry_pred`` is the session-entry predicate (the reference tests
    ``last_page_id`` empty — UserJumpDetailApp.java:63-71). Emits
    (user_id, event_id, is_bounce) for every *decided* entry event:
    decidable once watermark > entry.ts + gap.
    """
    if entry_pred is None:
        entry_pred = F.col("event_type") == "view"
    prepared = events.withColumn("ie", entry_pred.cast("int")).select(
        F.col(key).alias("user_id").cast("long"),
        F.col(ts_col).alias("ts"),
        F.col("event_id").cast("long"),
        "ie",
    )
    return (
        prepared.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _bounce_fn(gap_s),
            outputStructType=BOUNCE_OUT_SCHEMA,
            stateStructType=_BOUNCE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
