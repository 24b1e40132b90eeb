"""Structured Streaming layer (SURVEY.md §2.10 T-rows, §2.1 S-rows, §2.2 K-rows).

The reference is a streaming engine end-to-end: every app is a Flink job
over Kafka topics with event-time watermarks, tumbling windows, keyed
state, CEP timers, and per-row dynamic sinks. This package re-expresses
those semantics on Spark Structured Streaming:

- ``sources``  — file/rate/socket stream builders + the CDC envelope
  deserializer (S1-S4, S6; rt/utils/MyKafkaUtil.java:43-63,
  rt/app/function/CustomerDeserialization.java:26-72).
- ``windows``  — watermarked tumbling event-time aggregations, the
  streaming forms of A1-A4 (rt/app/dws/*App.java). Exact distinct uses
  ``size(collect_set(...))`` because Spark bans ``countDistinct`` in
  streaming aggs (bounded per-window state, same value).
- ``state``    — keyed-state operators: watermark-evicted streaming dedup
  (A5/T5, rt/app/dwd/UniqueVisitApp.java:52-90) and the bounce-detection
  state machine with event-time timeouts (W1/T7,
  rt/app/dwd/UserJumpDetailApp.java:54-108) via ``applyInPandasWithState``.
- ``sinks``    — ``foreachBatch`` writers: dynamic per-row destination
  fan-out (K2, rt/utils/MyKafkaUtil.java:30-41), incremental MERGE dim
  upsert (K3, rt/app/function/DimSinkFunction.java:44-75), gold append
  (K4), console (K5).
- ``runner``   — stage bounded inputs as time-ordered multi-file stream
  dirs, run queries to completion with ``trigger(availableNow=True)`` and
  checkpointing on (T9 — the reference leaves checkpointing commented
  out; we enable it).

Determinism contract (what makes streaming oracle-checkable): inputs are
staged ordered by event time across files, so the watermark advances
monotonically batch-over-batch and nothing is late-dropped; append-mode
window/timeout emission is then a pure function of the final watermark
(max event time - delay), which the DuckDB oracle reproduces as a cutoff
predicate.
"""
