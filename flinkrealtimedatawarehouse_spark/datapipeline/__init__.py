"""Large-scale training-data pipeline operators (BASELINE.json north star).

Beyond the reference's own warehouse surface, the operations a 100 TB
LLM-data pipeline needs, each designed so its shuffle is bucket-bounded
(never all-pairs) and its hot path stays in JVM built-ins:

- ``hashing``    — portable (Spark==DuckDB) hash/shingle expression
                   builders shared by the dedup family so every operator
                   has an exact SQL oracle.
- ``textdedup``  — exact dedup, MinHash+LSH, SimHash, n-gram Jaccard
                   verify, embedding-cosine near-dup, benchmark
                   decontamination (n-gram overlap), dedup cluster
                   assignment (connected components).
- ``similarity`` — brute-force cosine top-k baseline (expression and
                   Arrow/numpy-matmul paths) + integer-hyperplane LSH and
                   IVF-cell ANN as the scale paths.
- ``textstats``  — language-ID, quality scoring, token counting, document
                   fingerprinting, repetition signals, PII redaction,
                   corpus n-grams, training-mix sampling, token-budget
                   sequence packing over the ``documents`` table.
- ``multimodal`` — opaque binary columns + typed metadata; decode/feature
                   plumbing as Arrow-batched ``mapInPandas`` (decoder libs
                   not in this container -> deterministic fake behind a
                   flag, signatures/schemas real).
"""
