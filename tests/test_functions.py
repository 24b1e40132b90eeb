"""F1 tokenizer: built-in latin path and the CJK-bigram pandas-UDF fallback
(the dictionary-free stand-in for the reference's IK max-word mode,
rt/utils/KeywordUtil.java:25-54)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flinkrealtimedatawarehouse_spark.functions.tokenize import (
    cjk_aware_tokens,
    explode_tokens,
    tokenize_col,
)


def test_tokenize_col_splits_and_lowercases(spark):
    df = spark.createDataFrame([("Hello, Big-Data 42!",)], "s string")
    [row] = df.select(tokenize_col(F.col("s")).alias("t")).collect()
    assert row["t"] == ["hello", "big", "data", "42"]


def test_explode_tokens_keeps_original_columns(spark):
    df = spark.createDataFrame([(7, "a b")], "id long, s string")
    rows = explode_tokens(df, "s").collect()
    assert [(r["id"], r["word"]) for r in rows] == [(7, "a"), (7, "b")]


def test_cjk_bigrams_with_latin_mix(spark):
    df = spark.createDataFrame(
        [("Apple 小米手机",), ("中",), ("",), (None,)], "s string"
    )
    out = [r["t"] for r in df.select(cjk_aware_tokens(F.col("s")).alias("t")).collect()]
    assert out[0] == ["apple", "小米", "米手", "手机"]  # n-1 overlapping bigrams
    assert out[1] == ["中"]  # single CJK char yields itself
    assert out[2] == [] and out[3] == []
