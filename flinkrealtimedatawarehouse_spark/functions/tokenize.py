"""Tokenizer UDTF (SURVEY.md §2.11 F1).

Reference: ``split_words(str)`` — an IK Chinese tokenizer (max-word mode)
wrapped in a Flink UDTF and applied with ``LATERAL TABLE``
(rt/app/function/SplitFunction.java:19-30, rt/utils/KeywordUtil.java:25-54,
registration/use rt/app/dws/KeywordStatsApp.java:66-77).

Spark-first re-expression:

- ``tokenize_col`` — pure built-ins (split + filter): stays inside
  whole-stage codegen, zero Python in the hot path. Handles latin/digit
  word tokenization, which is what the keyword pipeline needs for the
  testdata corpus.
- ``cjk_aware_tokens`` — Arrow-batched pandas UDF fallback that adds CJK
  bigrams (the dictionary-free stand-in for IK max-word mode; the IK
  dictionary is not public input, so bigrams are the documented fallback
  per SURVEY.md §2.11). Only use when the corpus actually contains CJK.

``LATERAL TABLE(split_words(w))`` ≡ ``explode(tokenize_col(w))``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LATIN = re.compile(r"[a-z0-9]+")
_CJK = re.compile(r"[一-鿿]+")


def tokenize_col(col: Column, min_len: int = 1) -> Column:
    """Array of lowercase latin/digit tokens — built-ins only (JVM-side)."""
    arr = F.split(F.lower(col), r"[^a-z0-9]+")
    return F.filter(arr, lambda x: F.length(x) >= F.lit(min_len))


def explode_tokens(df: DataFrame, text_col: str, out_col: str = "word") -> DataFrame:
    """F1 applied as a projection: one row per token, original columns kept
    (the LATERAL TABLE join shape of KeywordStatsApp.java:74-77)."""
    return df.select("*", F.explode(tokenize_col(F.col(text_col))).alias(out_col))


@F.pandas_udf(T.ArrayType(T.StringType()))
def cjk_aware_tokens(texts: pd.Series) -> pd.Series:
    """Latin words + CJK bigrams (IK max-word-mode fallback), Arrow-batched.

    A CJK run of length 1 yields itself; length n>=2 yields its n-1
    overlapping bigrams — the standard dictionary-free approximation of
    max-word segmentation.
    """

    def one(s: str | None) -> list[str]:
        if s is None:
            return []
        s_low = s.lower()
        out = _LATIN.findall(s_low)
        for run in _CJK.findall(s_low):
            if len(run) == 1:
                out.append(run)
            else:
                out.extend(run[i : i + 2] for i in range(len(run) - 1))
        return out

    return texts.map(one)
