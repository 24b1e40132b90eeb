"""Adversarial-text oracle parity: the dp8 gate family (repetition,
lang-ID, quality, token counts, Gopher rules) run on Spark AND their
DuckDB oracle SQL over the SAME rows, compared cell-by-cell — on text
engineered to hit every cross-engine hazard this repo has been bitten
by or defended against:

- `\\x0B` / `\\f` (Java `\\s` includes them; RE2 historically didn't —
  the reason textstats.WS_RE is an explicit class),
- CRLF line ends (Java `$` matches before a trailing terminator,
  ends_with doesn't — the reason the ellipsis rule is ends_with),
- the multi-byte bullet `•` (regex-class encoding hazard — the reason
  the bullet rule is a substring-equality test),
- integer-width widening (DuckDB list_sum -> HUGEINT -> float64 in
  DataFrame fetches — the r3-r5 dp8 red; the comparison here fetches
  via .df() precisely so a reintroduced widening FAILS as a dtype
  mismatch instead of passing as a numerically-equal float).

Any future edit to textstats or the dp8 oracles that diverges the two
engines on these inputs fails here, locally, before a driver round.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

ADVERSARIAL_DOCS = [
    # (doc_id, text, lang, source) — doc_id % 25 == 0 so the gate's
    # sample filter keeps every row
    (0, "plain words the cat sat on the mat and it is fine", "en", "s0"),
    (25, "tab\tseparated\twords and\x0Bvertical\x0Btab plus\fformfeed here the a of", "en", "s0"),
    (50, "crlf line one...\r\nsecond line ends with dots...\r\nthird plain\r\n", "en", "s1"),
    (75, "- bullet dash line\n* bullet star line\n• bullet dot line\nnormal line the of and", "en", "s1"),
    (100, "ellipsis end...\nno ellipsis end\nmid... dots\nreal end...", "en", "s2"),
    (125, "", "und", "s2"),
    (150, "   \t \x0B \f  ", "und", "s2"),  # whitespace-only
    (175, "el la de y que en los gatos duermen mucho hoy", "es", "s3"),
    (200, "UPPER case And MiXeD 123 numbers 456 with punct!!! and ... the a", "en", "s3"),
    (225, "word " * 60 + "the a of and to in is", "en", "s0"),  # gopher-passing length
    (250, "repeat repeat repeat repeat repeat the the the the", "en", "s1"),
    (275, "unicode naïve café déjà vu — em-dash and … ellipsis char the of", "en", "s2"),
]


@pytest.fixture(scope="module")
def parity_env(spark, tmp_path_factory):
    """Write the adversarial docs once; register them as the DuckDB
    `documents` view the oracle SQL expects."""
    d = spark.createDataFrame(
        ADVERSARIAL_DOCS, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("long"))
    out = str(tmp_path_factory.mktemp("parity") / "documents")
    d.coalesce(1).write.mode("overwrite").parquet(out)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{out}/*.parquet')"
    )
    return spark, con, out


def _compare(spark_df, con, sql, name):
    sdf = spark_df.toPandas()
    odf = con.execute(sql).df()
    assert list(sdf.columns) == list(odf.columns), (
        f"{name}: column order diverged: {list(sdf.columns)} vs {list(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: row counts {len(sdf)} vs {len(odf)}"
    for col in sdf.columns:
        s_kind = sdf[col].dtype.kind
        o_kind = odf[col].dtype.kind
        # the dtype check IS the HUGEINT guard: int-vs-float disagreement
        # fails even when the values are numerically equal
        if s_kind in "iu":
            assert o_kind in "iu", (
                f"{name}.{col}: spark is integer but oracle fetched as "
                f"{odf[col].dtype} — a DuckDB expression widened past BIGINT"
            )
        for i, (sv, ov) in enumerate(zip(sdf[col].tolist(), odf[col].tolist())):
            assert sv == ov, (
                f"{name}.{col} row {i} (doc_id {sdf['doc_id'][i]}): "
                f"spark={sv!r} oracle={ov!r}"
            )


@pytest.mark.parametrize("branch", ["a", "b", "c", "d", "e"])
def test_dp8_branch_parity_on_adversarial_text(parity_env, branch):
    from flinkrealtimedatawarehouse_spark.benchqueries import pipeline
    from flinkrealtimedatawarehouse_spark.datapipeline import textstats  # noqa: F401

    spark, con, out = parity_env
    fns = {
        "a": (pipeline.q_dp8a_repetition, pipeline.SQL_DP8A),
        "b": (pipeline.q_dp8b_lang, pipeline.SQL_DP8B),
        "c": (pipeline.q_dp8c_quality, pipeline.SQL_DP8C),
        "d": (pipeline.q_dp8d_tokens, pipeline.SQL_DP8D),
        "e": (pipeline.q_dp8e_gopher, pipeline.SQL_DP8E),
    }
    fn, sql = fns[branch]
    # point the gate's load_table at the adversarial parquet: the gates
    # load `documents` from a sf_dir — fake one with a symlink layout
    sf_dir = os.path.dirname(out)
    link = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(out, link)
    _compare(fn(spark, sf_dir).orderBy("doc_id"), con, sql, f"dp8{branch}")
