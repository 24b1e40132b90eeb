"""Scalar / table-function surface (SURVEY.md §2.9, §2.11).

- ``tokenize`` — the F1 UDTF (split_words) re-expressed as array built-ins
  + explode, with a pandas-UDF CJK-bigram fallback for the IK tokenizer.

Everything date/conditional/string-scalar the reference uses maps 1:1 to
``pyspark.sql.functions`` (SURVEY.md §2.9) and is used inline by the
operators — no wrappers needed.
"""

from flinkrealtimedatawarehouse_spark.functions.tokenize import (  # noqa: F401
    cjk_aware_tokens,
    explode_tokens,
    tokenize_col,
)
