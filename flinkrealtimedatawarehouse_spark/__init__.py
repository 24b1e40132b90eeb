"""PySpark-native analytics engine with the query & data-processing
capabilities of ogleede/flinkRealTimeDataWareHouse (a Flink 1.12 real-time
e-commerce warehouse), re-expressed Spark-first.

Layout (see SURVEY.md for the operator inventory this covers):

- ``session``      — SparkSession factory (timezone/AQE/shuffle tuned).
- ``tables``       — parquet table catalog over the testdata star schema.
- ``schemas``      — StructType constants for the gmall-domain inputs
                     (behavior log, CDC envelope, config table).
- ``operators``    — batch/DataFrame re-expressions of every reference
                     operator: log split, dedup, bounce, interval joins,
                     dim enrichment, windowed stats, ADS queries, routing.
- ``functions``    — scalar/UDTF surface: tokenizer, text metrics, datetime.
- ``streaming``    — Structured Streaming forms: sources/sinks, watermarked
                     aggregations, stateful bounce, CDC routing foreachBatch.
- ``datapipeline`` — large-scale training-data ops: dedup (exact/MinHash/
                     SimHash/Jaccard/embedding), ANN similarity, text
                     analysis, multimodal column plumbing.

Everything here is plain PySpark DataFrame/SQL — Catalyst owns the physical
plan; Python UDFs appear only where built-ins cannot express the semantics
(tokenization fallback, stateful CEP timeout), and then as Arrow-batched
pandas UDFs.
"""

__version__ = "0.1.0"
