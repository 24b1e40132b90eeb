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
- pair counts are maintained INCREMENTALLY (``bpe_train``): each merge
  re-counts only the words containing the merged pair and folds a +/-
  delta into the persisted pair table — late merges touch a handful of
  words instead of rescanning the vocabulary (``bpe_train_recount`` is
  the full-rescan parity baseline);
- the merge application is one Arrow-batched pandas transform over the
  affected words — the scan-and-replace over a symbol list is inherently
  sequential per word, which is exactly the "built-ins can't express it"
  case for a pandas UDF (package policy);
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


def _top_pair(pair_counts: DataFrame):
    """Sennrich's winner rule: max total, then lexicographically smallest
    (a, b). One driver row per iteration."""
    return (
        pair_counts.orderBy(F.col("total").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(1)
        .collect()
    )


def _has_pair(a: str, b: str):
    """Predicate: the word's symbol list contains adjacent (a, b). The
    size guard matters: sequence(0, -1) DESCENDS in Spark, so an
    unguarded exists over a 1-symbol word would probe position -1."""
    return F.when(
        F.size("syms") >= 2,
        F.exists(
            F.sequence(F.lit(0), F.size("syms") - 2),
            lambda i: (F.element_at("syms", i + 1) == a)
            & (F.element_at("syms", i + 2) == b),
        ),
    ).otherwise(F.lit(False))


def bpe_train(
    docs: DataFrame, text_col: str, n_merges: int, min_freq: int = 1
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ordered
    merge list. Stops early when no pair reaches ``min_freq``.

    Incremental pair-count maintenance (the standard trick, same as the
    ``update_pair_statistics`` step of the original subword-nmt trainer):
    merging (a, b) only changes words that CONTAIN adjacent (a, b), and
    within the global pair table only pairs touching those words' merged
    positions. So each iteration:

    - filters the word table to the affected words (map-only predicate,
      no shuffle),
    - applies the merge to the affected words alone (the pandas pass runs
      over the affected slice, not the vocabulary),
    - folds the affected words' before/after pair counts into the
      persisted pair table as a +/- delta aggregate.

    As training progresses the affected slice shrinks rapidly (late
    merges touch a handful of words), which is where the win over
    ``bpe_train_recount``'s full rescan compounds — see SCALE.md "BPE
    training" for measured walls. Parity: bit-identical merge lists to
    ``bpe_train_recount`` and the plain-Python Sennrich reference
    (pinned in tests).

    The per-merge driver loop itself is inherent to the algorithm class
    (each merge depends on the counts after the previous one); what the
    incremental fold removes is the per-iteration full-table rescan.
    """
    syms_df = _word_table(docs, text_col).localCheckpoint(eager=True)
    # pin the partition count: the per-iteration union (unaffected +
    # new_affected) would otherwise GROW partitions geometrically —
    # 2^n_merges empty tasks by the end — so every checkpointed frame is
    # coalesced back to the word table's original width
    n_parts = max(1, syms_df.rdd.getNumPartitions())
    pair_counts = _pair_counts(syms_df).coalesce(n_parts).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = _top_pair(pair_counts)
        if not top or top[0]["total"] < min_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))

        affected = syms_df.filter(_has_pair(a, b))
        unaffected = syms_df.filter(~_has_pair(a, b))
        old_delta = _pair_counts(affected).select(
            "a", "b", (-F.col("total")).alias("total")
        )
        new_affected = _apply_merge(affected, a, b)
        # localCheckpoint: new_affected feeds BOTH the delta and the next
        # word table; materializing once also truncates the growing
        # union/UDF lineage so iteration cost stays flat
        new_affected = new_affected.coalesce(n_parts).localCheckpoint(eager=True)
        new_delta = _pair_counts(new_affected)
        pair_counts = (
            pair_counts.unionByName(old_delta)
            .unionByName(new_delta)
            .groupBy("a", "b")
            .agg(F.sum("total").alias("total"))
            .filter(F.col("total") > 0)
        ).coalesce(n_parts).localCheckpoint(eager=True)
        syms_df = (
            unaffected.unionByName(new_affected)
            .coalesce(n_parts)
            .localCheckpoint(eager=True)
        )
    return merges


def bpe_train_recount(
    docs: DataFrame, text_col: str, n_merges: int, min_freq: int = 1
) -> list[tuple[str, str]]:
    """The straightforward trainer: re-count EVERY pair over the full
    word table each iteration. Kept as the parity baseline for
    ``bpe_train``'s incremental fold (identical merge lists by
    construction — pinned in tests) and as the simpler choice for tiny
    vocabularies where the delta machinery isn't worth its overhead."""
    syms_df = _word_table(docs, text_col)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        # localCheckpoint truncates the growing lineage (one pandas UDF
        # layer per merge) so iteration cost stays flat
        syms_df = syms_df.localCheckpoint(eager=True)
        top = _top_pair(_pair_counts(syms_df))
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
