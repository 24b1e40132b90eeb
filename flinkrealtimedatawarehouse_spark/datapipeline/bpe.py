"""Byte-pair-encoding tokenizer training + encoding (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units", ACL 2016 —
the classic word-frequency BPE).

The engine's token counting (textstats) uses a fixed regex "BPE-ish"
proxy; this module TRAINS a real merge table from the corpus and encodes
with it.

Spark shape (what makes it scale):
- the corpus is read ONCE into a (distinct word, count) table — every
  subsequent pass runs over distinct words weighted by count, which is
  orders of magnitude smaller than the corpus;
- each merge iteration = one pair-count aggregation over that table
  (explode adjacent symbol pairs -> groupBy sum, partial agg map-side)
  plus one Arrow-batched pandas transform applying the chosen merge —
  the scan-and-replace over a symbol list is inherently sequential per
  word, which is exactly the "built-ins can't express it" case for a
  pandas UDF (package policy);
- only the single winning pair crosses to the driver per iteration.

Determinism: the winning pair is (max total count, then lexicographically
smallest pair) — pinned against a plain-Python reference implementation
in tests, merge list AND encodings.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

END = "</w>"


def _word_table(docs: DataFrame, text_col: str) -> DataFrame:
    words = (
        docs.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")), lambda i: F.substring(F.col("w"), i, 1)
    )
    return words.withColumn("syms", F.concat(chars, F.array(F.lit(END))))


def _pair_counts(syms_df: DataFrame) -> DataFrame:
    pairs = syms_df.filter(F.size("syms") >= 2).select(
        "ct",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("syms") - 2),
                lambda i: F.struct(
                    F.element_at("syms", i + 1).alias("a"),
                    F.element_at("syms", i + 2).alias("b"),
                ),
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.a", "p.b").agg(F.sum("ct").alias("total"))


def merge_symbols(syms: list, a: str, b: str) -> list:
    """One left-to-right merge pass: every non-overlapping adjacent (a, b)
    becomes a+b (the classic BPE replace)."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _apply_merge(syms_df: DataFrame, a: str, b: str) -> DataFrame:
    @F.pandas_udf(ArrayType(StringType()))
    def apply_one(col: pd.Series) -> pd.Series:
        return col.apply(lambda s: merge_symbols(list(s), a, b))

    return syms_df.withColumn("syms", apply_one("syms"))


def bpe_train(
    docs: DataFrame, text_col: str, n_merges: int, min_freq: int = 1
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ordered
    merge list. Stops early when no pair reaches ``min_freq``."""
    syms_df = _word_table(docs, text_col)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        # localCheckpoint truncates the growing lineage (one pandas UDF
        # layer per merge) so iteration cost stays flat
        syms_df = syms_df.localCheckpoint(eager=True)
        top = (
            _pair_counts(syms_df)
            .orderBy(F.col("total").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["total"] < min_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        syms_df = _apply_merge(syms_df, a, b)
    return merges


def bpe_encode(
    docs: DataFrame, id_col: str, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Encode each doc with a trained merge list: (``id_col``, ``tokens``
    array<string>, ``n_tokens``). The merge loop runs per DISTINCT word
    (Arrow-batched) and joins back to the corpus token stream — the
    encode cost scales with the vocabulary, not the corpus.
    """
    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("pos", "w"),
    ).filter(F.col("w") != "")
    vocab = toks.select("w").distinct()
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")), lambda i: F.substring(F.col("w"), i, 1)
    )
    vocab = vocab.withColumn("syms", F.concat(chars, F.array(F.lit(END))))

    m = list(merges)

    @F.pandas_udf(ArrayType(StringType()))
    def apply_all(col: pd.Series) -> pd.Series:
        def enc(s):
            s = list(s)
            for a, b in m:
                s = merge_symbols(s, a, b)
            return s

        return col.apply(enc)

    encoded = vocab.withColumn("syms", apply_all("syms"))
    # no broadcast hint: a web-scale corpus has hundreds of millions of
    # distinct words — AQE broadcasts small vocabularies and falls back
    # to a shuffle join on the word key otherwise
    joined = toks.join(encoded, "w")
    return (
        joined.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "syms"))),
                    lambda x: x["syms"],
                )
            ).alias("tokens")
        )
        .withColumn("n_tokens", F.size("tokens"))
    )
