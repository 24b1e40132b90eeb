"""Text analysis over the ``documents`` table (north-star operators):
language-ID, quality scoring, token counting, document fingerprinting.

Everything is deterministic built-in expressions (no UDFs in the hot path)
with an exact DuckDB-oracle twin; the heuristics are intentionally simple
and documented — the value at 100 TB is that each is a single narrow
projection + one aggregate, no shuffle beyond the final groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flinkrealtimedatawarehouse_spark.datapipeline.hashing import (
    spark_phash,
    spark_shingles,
    spark_tokens,
)

# Explicit ASCII whitespace class, shared by every whitespace split and
# mirrored verbatim in the DuckDB oracles. `\s` is NOT portable: Java
# regex has always included \x0B (vertical tab) while RE2 only added it
# in 2023, so the same `\s+` split can tokenize differently between the
# two engines (and between DuckDB versions bundling different RE2s).
# \t \n \x0B \f \r are escape sequences both engines parse identically.
WS_RE = r"[ \t\n\x0B\f\r]+"
# chars removed when counting punctuation for the BPE estimate — same
# portability rule (explicit class instead of \s).
NON_PUNCT_RE = r"[a-z0-9 \t\n\x0B\f\r]"
# Bullet prefixes for the Gopher bullet-line rule. Tested with substring
# equality (not a regex class) because a multi-byte literal like the
# bullet dot inside a regex class is another cross-engine hazard.
BULLET_CHARS = ("-", "*", "•")

# Tiny stopword profiles for the n-gram/stopword language heuristic. Tie
# order = dict order (en first) — the oracle encodes the same precedence.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "en", "los"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans"),
}


def _stopword_hits(tokens: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


def lang_id(docs: DataFrame, text_col: str) -> DataFrame:
    """Predict language = profile with the most stopword hits (ties and
    zero hits -> 'und'). A real pipeline swaps in fastText/CLD3 via the
    same column contract; the plumbing and output schema stay identical."""
    toks = spark_tokens(F.col(text_col))
    d = docs.withColumn("_toks", toks)
    hit_cols = {lang: _stopword_hits(F.col("_toks"), ws) for lang, ws in LANG_STOPWORDS.items()}
    best = None
    for lang, hits in hit_cols.items():
        d = d.withColumn(f"_h_{lang}", hits)
        best = F.col(f"_h_{lang}") if best is None else F.greatest(best, F.col(f"_h_{lang}"))
    d = d.withColumn("_best", best)
    pred = F.lit("und")
    # reversed so earlier dict entries win ties (when() chains short-circuit)
    expr = None
    for lang in LANG_STOPWORDS:
        cond = (F.col(f"_h_{lang}") == F.col("_best")) & (F.col("_best") > 0)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    pred = expr.otherwise(F.lit("und"))
    return d.withColumn("pred_lang", pred).drop(
        "_toks", "_best", *[f"_h_{lang}" for lang in LANG_STOPWORDS]
    )


def quality_score(docs: DataFrame, text_col: str) -> DataFrame:
    """Heuristic quality features + composite score:

    - n_tokens, mean token length
    - alnum_ratio: alnum+space chars / total chars
    - stop_ratio: english-stopword tokens / tokens
    - score = 0.4*min(n_tokens/100,1) + 0.3*alnum_ratio + 0.3*min(stop_ratio*5,1)

    Also emits the exact integer numerators/denominators behind the
    ratios (``n_chars``, ``alnum_chars``, ``stop_hits``) so verification
    gates can hash engine-independent integer micros instead of doubles
    (the dp8 de-float: no round()-on-double anywhere in the gate surface).
    """
    text = F.col(text_col)
    toks = spark_tokens(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    alnum = F.length(F.regexp_replace(F.lower(text), r"[^a-z0-9 ]", ""))
    alnum_ratio = F.when(n_chars > 0, alnum.cast("double") / n_chars).otherwise(F.lit(0.0))
    stop_hits = _stopword_hits(toks, LANG_STOPWORDS["en"])
    stop_ratio = F.when(n_tokens > 0, stop_hits.cast("double") / n_tokens).otherwise(F.lit(0.0))
    mean_tok_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)).cast("double") / n_tokens,
    ).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * F.least(n_tokens.cast("double") / 100.0, F.lit(1.0))
        + F.lit(0.3) * alnum_ratio
        + F.lit(0.3) * F.least(stop_ratio * 5.0, F.lit(1.0))
    )
    return docs.withColumns(
        {
            "n_tokens": n_tokens,
            "n_chars": n_chars.cast("long"),
            "alnum_chars": alnum.cast("long"),
            "stop_hits": stop_hits.cast("long"),
            "alnum_ratio": F.round(alnum_ratio, 6),
            "stop_ratio": F.round(stop_ratio, 6),
            "mean_tok_len": F.round(mean_tok_len, 6),
            "quality": F.round(score, 6),
        }
    )


def embed_text(docs: DataFrame, id_col: str, text_col: str, dim: int = 16) -> DataFrame:
    """Deterministic feature-hash text embedding (the hashing trick):
    token t lands in bucket ``h(t) % dim`` with sign ±1 from the next hash
    bit; the signed counts are L2-normalized (6-dp). Adds ``embedding``
    (array<double>).

    This is the embedding-GENERATION stub of the vector stack: it gives
    the corpus a real, engine-independent text->vector path (gated as
    the ``dp11_fingerprint`` gate (embed branch) against a DuckDB oracle, and fed end-to-end
    through ``build_ivf_index``/``ivf_index_topk`` in
    tests/test_datapipeline.py) that feeds the existing index/search
    operators; a learned encoder swaps in behind the same column contract
    via Arrow-batched mapInPandas (see multimodal.py's pattern) without
    touching anything downstream.

    Scale: map-only, JVM-only — one md5 per token then ``dim`` integer
    folds inside whole-stage codegen; no shuffle, no Python.
    """
    toks = spark_tokens(F.col(text_col))
    th = F.transform(toks, lambda t: spark_phash(t) % F.lit(1 << 30))

    def _comp(b: int):
        # factory (not lambda defaults): PySpark counts default params as HOF arity
        return F.aggregate(
            F.col("_th"),
            F.lit(0).cast("long"),
            lambda acc, t: acc
            + F.when(t % dim == b, F.lit(1) - 2 * (F.floor(t / dim).cast("long") % 2)).otherwise(
                F.lit(0)
            ),
        )

    with_th = docs.withColumn("_th", th)
    raw = F.array(*[_comp(b) for b in range(dim)])
    with_raw = with_th.withColumn("_raw", raw).drop("_th")
    nrm = F.sqrt(
        F.aggregate(F.col("_raw"), F.lit(0).cast("long"), lambda a, x: a + x * x).cast("double")
    )
    vec = F.when(
        nrm > 0, F.transform(F.col("_raw"), lambda x: F.round(x.cast("double") / nrm, 6))
    ).otherwise(F.transform(F.col("_raw"), lambda x: F.lit(0.0)))
    return with_raw.withColumn("embedding", vec).drop("_raw")


def gopher_rules(
    docs: DataFrame,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher quality-filter rules (Rae et al. 2021, appendix A1.1) — the
    standard pre-training document filter — as exact engine-independent
    expressions (map-only, no shuffle, whole-stage codegen):

    - word count in [min_words, max_words]
    - mean word length in [3, 10]
    - >= 80% of words contain an alphabetic character
    - <= 90% of non-blank lines start with a bullet (-, *, or the dot)
    - <= 30% of non-blank lines end with '...'
    - >= 2 distinct English stopwords present

    Adds g_words, g_mean_word_len, g_alpha_frac, g_bullet_frac,
    g_ellipsis_frac, g_stop_kinds, and the conjunction ``gopher_pass`` —
    plus the exact integer counts behind every ratio (``g_sum_word_len``,
    ``g_alpha_words``, ``g_lines``, ``g_bullet_lines``,
    ``g_ellipsis_lines``) so gates hash integers, never doubles.
    ``gopher_pass`` itself is decided by cross-multiplied INTEGER
    comparisons (e.g. alpha_frac >= 0.8 as ``5*n_alpha >= 4*n_words``),
    so the pass/fail bit is bit-identical in any engine with 64-bit
    integers — no float thresholds anywhere.
    """
    text = F.col(text_col)
    words = F.filter(F.split(text, WS_RE), lambda t: F.length(t) > 0)
    n_words = F.size(words).cast("long")
    sum_wl = F.aggregate(words, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    n_alpha = F.size(F.filter(words, lambda t: t.rlike("[A-Za-z]"))).cast("long")
    mean_wl = F.when(n_words > 0, sum_wl.cast("double") / n_words).otherwise(F.lit(0.0))
    alpha_frac = F.when(n_words > 0, n_alpha.cast("double") / n_words).otherwise(F.lit(0.0))

    lines = F.filter(F.split(text, "\n"), lambda l: F.length(F.trim(l)) > 0)
    n_lines = F.size(lines).cast("long")
    # substring-equality bullet test and ends_with ellipsis test: no
    # regex anchors ($ matches before a final \r in Java but not RE2)
    # and no multi-byte char class — portable across engines/versions.
    n_bullet = F.size(
        F.filter(lines, lambda l: F.substring(F.trim(l), 1, 1).isin(*BULLET_CHARS))
    ).cast("long")
    n_ellipsis = F.size(F.filter(lines, lambda l: l.endswith("..."))).cast("long")
    bullet_frac = F.when(n_lines > 0, n_bullet.cast("double") / n_lines).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0, n_ellipsis.cast("double") / n_lines
    ).otherwise(F.lit(0.0))

    toks = spark_tokens(text)

    def _has(s: str):
        # factory (not lambda defaults): PySpark counts default params as HOF arity
        return F.exists(toks, lambda t: t == F.lit(s))

    stop_kinds = None
    for s in LANG_STOPWORDS["en"]:
        hit = F.when(_has(s), 1).otherwise(0)
        stop_kinds = hit if stop_kinds is None else stop_kinds + hit

    # Thresholds as cross-multiplied integer comparisons: exact in any
    # engine, no rounding convention involved. n_words > 0 guards the
    # mean-word-len bounds (0/0 must not satisfy "in [3,10]").
    gpass = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (n_words > 0)
        & (sum_wl >= 3 * n_words)
        & (sum_wl <= 10 * n_words)
        & (n_alpha * 5 >= n_words * 4)
        & (n_bullet * 10 <= n_lines * 9)
        & (n_ellipsis * 10 <= n_lines * 3)
        & (stop_kinds >= 2)
    )
    return docs.withColumns(
        {
            "g_words": n_words,
            "g_sum_word_len": sum_wl,
            "g_alpha_words": n_alpha,
            "g_lines": n_lines,
            "g_bullet_lines": n_bullet,
            "g_ellipsis_lines": n_ellipsis,
            "g_mean_word_len": F.round(mean_wl, 6),
            "g_alpha_frac": F.round(alpha_frac, 6),
            "g_bullet_frac": F.round(bullet_frac, 6),
            "g_ellipsis_frac": F.round(ellipsis_frac, 6),
            "g_stop_kinds": stop_kinds.cast("int"),
            "gopher_pass": gpass,
        }
    )


def token_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish subword
    estimate (alnum runs contribute ceil(len/4) units; each punct char is
    one unit) — the standard chars/4 heuristic, exactly reproducible."""
    text = F.col(text_col)
    ws_tokens = F.size(F.filter(F.split(text, WS_RE), lambda t: F.length(t) > 0))
    toks = spark_tokens(text)
    sub_alnum = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.ceil(F.length(t) / F.lit(4.0)).cast("long")
    )
    n_punct = F.length(F.regexp_replace(F.lower(text), NON_PUNCT_RE, ""))
    return docs.withColumns(
        {"ws_tokens": ws_tokens, "bpe_est_tokens": (sub_alnum + n_punct).cast("long")}
    )


def repetition_stats(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signals per document:

    - ``ttr``: type-token ratio (distinct tokens / tokens); low = repetitive
    - ``top_bigram_frac``: occurrences of the most frequent token bigram ×
      2 / token count — the classic "fraction of text inside the top
      2-gram" quality filter

    Shape for scale: the per-doc bigram mode needs a count per (doc,
    bigram); that is explode -> two-level partial aggregate (map-side
    combine on both), so the shuffle carries (doc, bigram) counts, not raw
    text. Docs with < 2 tokens get top_bigram_frac 0.
    """
    toks_df = docs.select(F.col(id_col), spark_tokens(F.col(text_col)).alias("toks")).filter(
        F.size("toks") > 0
    )
    base = toks_df.select(
        id_col,
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        spark_shingles(F.col("toks"), 2).alias("bigrams"),
    )
    top = (
        base.select(id_col, F.explode("bigrams").alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("ct"))
        .groupBy(id_col)
        .agg(F.max("ct").alias("top_bg_ct"))
    )
    return (
        base.join(top, id_col, "left")
        .select(
            id_col,
            F.col("n_tokens"),
            # exact integer numerators exposed for integer-micros gating
            F.col("n_distinct").cast("long").alias("n_distinct"),
            F.coalesce(F.col("top_bg_ct"), F.lit(0)).cast("long").alias("top_bg_ct"),
            F.round(F.col("n_distinct").cast("double") / F.col("n_tokens"), 6).alias("ttr"),
            F.round(
                F.coalesce(F.col("top_bg_ct"), F.lit(0)).cast("double") * 2 / F.col("n_tokens"), 6
            ).alias("top_bigram_frac"),
        )
    )


# PII patterns kept to RE2-safe syntax (char classes only, no lookaround)
# so the Spark (Java regex) and DuckDB (RE2) engines match identically.
PII_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_PHONE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{3,4}"


def pii_redact(docs: DataFrame, text_col: str) -> DataFrame:
    """Scrub emails / intl-format phone numbers, keeping counts:
    ``n_emails``, ``n_phones``, ``clean_text`` (matches replaced with
    [EMAIL]/[PHONE]). Pure regexp built-ins — one narrow projection, no
    shuffle; at 100 TB this runs entirely map-side."""
    text = F.col(text_col)
    return docs.withColumns(
        {
            "n_emails": F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), F.lit(0))),
            "n_phones": F.size(F.regexp_extract_all(text, F.lit(PII_PHONE), F.lit(0))),
            "clean_text": F.regexp_replace(
                F.regexp_replace(text, PII_EMAIL, "[EMAIL]"), PII_PHONE, "[PHONE]"
            ),
        }
    )


def corpus_ngrams(docs: DataFrame, text_col: str, n: int = 2, k: int = 20) -> DataFrame:
    """Corpus-wide top-k token n-grams: explode -> count -> top-k.

    Scale shape: counts partial-aggregate map-side before the single
    hash exchange on the n-gram key; the final top-k is a TakeOrdered on
    (ct desc, gram asc) — deterministic under ties, no full sort of the
    tail. A hot-key skew here is inherent to the data (Zipf) but the
    partial aggregate already collapses it to one row per partition."""
    # tokens in their own projection: spark_shingles references its input
    # 3× (size guard, sequence bound, slice in the lambda) — inlined, the
    # regex split would re-run per shingle position (see textdedup note)
    toks_df = docs.select(spark_tokens(F.col(text_col)).alias("toks"))
    grams = toks_df.select(F.explode(spark_shingles(F.col("toks"), n)).alias("gram"))
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("ct"))
        .orderBy(F.col("ct").desc(), F.col("gram"))
        .limit(k)
    )


def fingerprint(docs: DataFrame, id_col: str, text_col: str,
                shingle_n: int = 5, mod: int = 1 << 20) -> DataFrame:
    """Winnowing-style document fingerprint: the minimum portable hash of
    the word ``shingle_n``-grams, reduced mod ``mod`` — collisions group
    near-identical prefixes/bodies. Output: (id, fingerprint)."""
    fp = F.array_min(F.transform(F.col("_sh"), lambda s: spark_phash(s) % F.lit(mod)))
    return (
        docs.select(F.col(id_col), spark_tokens(F.col(text_col)).alias("_toks"))
        .select(id_col, spark_shingles(F.col("_toks"), shingle_n).alias("_sh"))
        .select(F.col(id_col), F.coalesce(fp, F.lit(-1)).alias("fingerprint"))
    )


def mix_sample(docs: DataFrame, id_col: str, rates: dict[str, float],
               rate_col: str = "source") -> DataFrame:
    """Training-mix construction: deterministic per-source sampling.

    ``rates`` maps a ``rate_col`` value to a keep-fraction; a row is kept
    iff phash(id) % 10000 < rate*10000 — a pure function of the id, so the
    sample is reproducible across runs/engines (no RNG, no seed drift) and
    stable under re-partitioning. Unlisted sources are dropped (rate 0).
    One narrow filter, no shuffle; at 100 TB this is a map-only pass.
    """
    bucket = spark_phash(F.col(id_col).cast("string")) % F.lit(10_000)
    keep = None
    for src, rate in rates.items():
        cond = (F.col(rate_col) == src) & (bucket < int(round(rate * 10_000)))
        keep = cond if keep is None else keep | cond
    return docs.filter(keep if keep is not None else F.lit(False))


def lm_quality(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-internal n-gram LM quality score (the KenLM-style filter of
    training pipelines, self-trained): per-doc mean add-one-smoothed
    bigram log-probability against the CORPUS's own bigram statistics,

        score(d) = mean over bigrams (w1,w2) of
                   ln( (c(w1,w2) + 1) / (c(w1) + V) )

    where c() are corpus counts and V the corpus vocabulary size.
    Fluent, typical text scores high; gibberish, boilerplate-free keyword
    stuffing, and wrong-language docs score low. Deterministic (integer
    counts, one ln per bigram type) and oracle-exact.

    Output: (id, n_bigrams, lm_logprob). Docs with < 2 tokens get
    ``n_bigrams = 0`` and NULL lm_logprob (no evidence ≠ low quality).

    Scale: one unigram aggregation (shuffles carry counts, not text), a
    window count over the bigram instances for c(w1,w2) — no
    bigram-table self-join, same rationale as ``bm25_terms``'s df — and
    one join of the instances to the unigram table, keyed on w1: every
    stage is O(tokens), no all-pairs anywhere. The vocabulary size joins
    in lazily as a 1-row broadcast cross join (an eager ``count()`` here
    would fire a hidden Spark job at plan-construction time). The
    unigram table is left to AQE's broadcast decision — web-scale
    vocabularies (typos, ids) can reach 10^8 types.
    """
    toks = (
        docs.select(F.col(id_col), spark_tokens(F.col(text_col)).alias("_t"))
    )
    grams = toks.select(
        id_col,
        F.explode(
            F.zip_with(
                F.slice(F.col("_t"), 1, F.greatest(F.size("_t") - 1, F.lit(0))),
                F.slice(F.col("_t"), 2, F.greatest(F.size("_t") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    uni = toks.select(F.explode("_t").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c1")
    )
    vocab_df = uni.agg(F.count(F.lit(1)).alias("_v"))

    scored = (
        grams.withColumn(
            "c2", F.count(F.lit(1)).over(Window.partitionBy("w1", "w2"))
        )
        .join(uni.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vocab_df))
        .withColumn(
            "_lp",
            F.log((F.col("c2") + 1).cast("double") / (F.col("c1") + F.col("_v")).cast("double")),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("_lp"), 6).alias("lm_logprob"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "lm_logprob",
        )
    )


# Bucket space + range arithmetic for split_assign, factored so the
# engine and the DuckDB oracle (benchqueries.pipeline._duck_split_case)
# share ONE spec — the modulus and rate rounding can never diverge.
SPLIT_BUCKET_SPACE = 10_000


def split_ranges(splits: tuple[tuple[str, float], ...]) -> list[tuple[str, int]]:
    """Cumulative closed-open upper bounds per split over the bucket
    space, in declaration order; the remainder falls to the LAST split."""
    hi, out = 0, []
    for name, rate in splits:
        hi += int(round(rate * SPLIT_BUCKET_SPACE))
        out.append((name, hi))
    return out


def split_assign(docs: DataFrame, id_col: str,
                 splits: tuple[tuple[str, float], ...] = (
                     ("train", 0.8), ("val", 0.1), ("test", 0.1)),
                 salt: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: every row gets a ``split``
    label from a hash bucket of (id, salt) against the cumulative split
    ranges. Unlike mix_sample (a keep/drop filter), this is a total
    multi-way assignment — every row lands in exactly one split.

    The bucket is a pure function of the id and the salt, so (a) the
    split is reproducible across runs, engines, and re-partitioning,
    (b) re-running on a grown corpus never moves an old row between
    splits (no leakage of former-train docs into test), and (c) changing
    the salt re-draws the assignment wholesale. Map-only: no shuffle, no
    RNG, no driver state; at 100 TB this is a free extra projection on
    any pass that already reads the id.

    Ranges are closed-open on a 10,000-bucket space in declaration order;
    any remainder bucket (rates summing < 1) falls into the LAST split.
    """
    bucket = spark_phash(
        F.concat(F.col(id_col).cast("string"), F.lit("_" + salt))
    ) % F.lit(SPLIT_BUCKET_SPACE)
    conds = split_ranges(splits)
    expr = None
    for name, upper in conds[:-1]:
        expr = (F.when(bucket < upper, F.lit(name)) if expr is None
                else expr.when(bucket < upper, F.lit(name)))
    expr = F.lit(splits[-1][0]) if expr is None else expr.otherwise(F.lit(splits[-1][0]))
    return docs.withColumn("split", expr)


def query_terms(query: str) -> list[str]:
    """Driver-side twin of ``spark_tokens`` for a query literal: same
    lowercase/split/drop-empties rule, distinct terms in first-seen
    order (BM25 query scoring sums each distinct term once)."""
    import re

    seen: list[str] = []
    for t in re.split(r"[^a-z0-9]+", query.lower()):
        if t and t not in seen:
            seen.append(t)
    return seen


def _bm25_rank(postings: DataFrame, stats: DataFrame, id_col: str,
               k1: float, b: float, k: int) -> DataFrame:
    """Shared BM25 scoring tail for ``bm25_search`` and
    ``postings_search`` (one definition of the formula and its
    integer-micros quantization — the two paths cannot drift).
    ``postings``: (id, dl, term, tf, df) rows for the query's terms;
    ``stats``: 1-row (n_docs, avgdl)."""
    scored = (
        postings.crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "score_u",
            F.round(
                F.round(
                    F.col("idf") * (F.col("tf") * (k1 + 1.0))
                    / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
                    6,
                )
                * 1_000_000
            ).cast("long"),
        )
    )
    total = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hit_terms"), F.sum("score_u").alias("score_u")
    )
    # Top-k via orderBy().limit(): Catalyst compiles this to
    # TakeOrderedAndProject — each partition keeps its local top-k and
    # only k rows per partition reach the driver-side merge. The naive
    # alternative (partitionless Window + row_number) funnels EVERY
    # matching document into a single task — for a common query term at
    # corpus scale that is millions of rows through one partition (the
    # "WindowExec: No Partition Defined" warning). rank is stamped
    # AFTER the limit, on <= k rows, where a 1-partition window is free.
    topk = total.orderBy(F.col("score_u").desc(), F.col(id_col).asc()).limit(k)
    # Constant-valued partition key: same single-partition semantics over
    # the <= k surviving rows, but a non-empty partition spec, so the
    # plan carries no partitionless WindowExec (and no scale-smell
    # warning). id*0 rather than lit(1) because the optimizer's
    # EliminateWindowPartitions rule strips foldable partition keys.
    w = Window.partitionBy(F.col(id_col) * 0).orderBy(
        F.col("score_u").desc(), F.col(id_col).asc()
    )
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select(id_col, "rank", "n_hit_terms", (F.col("score_u") / 1_000_000).alias("score"))
    )


def bm25_search(docs: DataFrame, id_col: str, text_col: str, query: str,
                k1: float = 1.2, b: float = 0.75, k: int = 10) -> DataFrame:
    """Full-text retrieval: BM25-rank every document against ``query``,
    returning the top-``k`` (``id_col``, n_hit_terms, score) — the query
    side of ``bm25_terms``' scoring.

    Scale shape: the query-term filter lands BEFORE the tf shuffle (only
    matching (doc, term) rows leave the scan stage), df(term) is the
    same per-term window count as bm25_terms — the filter keeps every
    row of a matching term, so the windowed row count IS the corpus df —
    and corpus scalars (N, avgdl) broadcast from a 1-row aggregate. The
    per-term scores sum as integer micros so the ranking key is
    associative and engine-independent; the top-k tail is
    ``orderBy().limit()`` -> TakeOrderedAndProject (per-partition local
    top-k, k rows per partition to the driver merge — see _bm25_rank).
    """
    terms = query_terms(query)
    if not terms:
        raise ValueError("query has no tokens")
    toks = docs.select(F.col(id_col), spark_tokens(F.col(text_col)).alias("toks")).filter(
        F.size("toks") > 0
    )
    tf = (
        toks.select(F.col(id_col), F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.size("toks")).alias("avgdl")
    )
    term_w = Window.partitionBy("term")
    postings = tf.withColumn("df", F.count(F.lit(1)).over(term_w))
    return _bm25_rank(postings, stats, id_col, k1, b, k)


POSTINGS_BUCKETS = 64


def _query_term_rows(queries: list[tuple[int, str]]) -> list[tuple[int, str]]:
    """(query_id, term) rows for the batched searches, enforcing the
    single-query path's contract per query: a token-less query raises
    (not silently-zero-rows) and duplicate query ids raise (the dict-
    of-queries shape would silently discard one)."""
    seen: set = set()
    qrows: list[tuple[int, str]] = []
    for qid, q in queries:
        if qid in seen:
            raise ValueError(f"duplicate query_id {qid}")
        seen.add(qid)
        terms = query_terms(q)
        if not terms:
            raise ValueError(f"query {qid} has no tokens")
        qrows.extend((qid, t) for t in terms)
    if not qrows:
        raise ValueError("no queries given")
    return qrows


def bm25_search_many(docs: DataFrame, id_col: str, text_col: str,
                     queries: list[tuple[int, str]],
                     k1: float = 1.2, b: float = 0.75, k: int = 10) -> DataFrame:
    """Batched full-text retrieval: score N queries in ONE corpus pass —
    the serving pattern that matters at scale (N sequential
    ``bm25_search`` calls re-tokenize and re-scan the corpus N times;
    this tokenizes once, filters once on the UNION of query terms, and
    fans out per-query via a broadcast (query_id, term) join).

    Per query the result is IDENTICAL to ``bm25_search`` with that query
    (parity-pinned): df(term) is counted over the term's postings BEFORE
    the query join (a term shared by many queries is still one corpus
    count), per-term scores quantize to integer micros through the same
    formula, and the per-query top-k is a rank-over-window capped at k —
    Catalyst executes the row_number + filter as a keyed WindowGroupLimit
    (per-partition per-query top-k, never a global funnel).

    Returns (query_id, ``id_col``, rank, n_hit_terms, score).
    """
    qrows = _query_term_rows(queries)
    all_terms = sorted({t for _, t in qrows})
    spark = docs.sparkSession
    qdf = spark.createDataFrame(qrows, "query_id long, term string")

    toks = docs.select(F.col(id_col), spark_tokens(F.col(text_col)).alias("toks")).filter(
        F.size("toks") > 0
    )
    tf = (
        toks.select(F.col(id_col), F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .filter(F.col("term").isin(all_terms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.size("toks")).alias("avgdl")
    )
    term_w = Window.partitionBy("term")
    # df BEFORE the query fan-out join: the filtered scan keeps every
    # posting of a matching term, so the window count IS the corpus df,
    # and a term shared by several queries is never double-counted
    postings = tf.withColumn("df", F.count(F.lit(1)).over(term_w))
    return _bm25_rank_many(postings, qdf, stats, id_col, k1, b, k)


def _bm25_rank_many(postings: DataFrame, qdf: DataFrame, stats: DataFrame,
                    id_col: str, k1: float, b: float, k: int) -> DataFrame:
    """Shared multi-query scoring tail (``bm25_search_many`` and
    ``postings_search_many`` — one definition, the two paths cannot
    drift). ``postings``: (id, dl, term, tf, df) rows covering the UNION
    of query terms; ``qdf``: (query_id, term); ``stats``: 1-row
    (n_docs, avgdl). Per-query top-k = keyed WindowGroupLimit."""
    scored = (
        postings.join(F.broadcast(qdf), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "score_u",
            F.round(
                F.round(
                    F.col("idf") * (F.col("tf") * (k1 + 1.0))
                    / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
                    6,
                )
                * 1_000_000
            ).cast("long"),
        )
    )
    total = scored.groupBy("query_id", id_col).agg(
        F.count(F.lit(1)).alias("n_hit_terms"), F.sum("score_u").alias("score_u")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_u").desc(), F.col(id_col).asc()
    )
    return (
        total.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank", "n_hit_terms",
                (F.col("score_u") / 1_000_000).alias("score"))
    )


def build_postings(docs: DataFrame, id_col: str, text_col: str, out_dir: str,
                   n_buckets: int = POSTINGS_BUCKETS) -> None:
    """Persist an inverted index: one parquet table of postings
    (term, doc, tf, dl, df) partitioned by ``bucket = pmod(xxhash64(term),
    n_buckets)``, plus a 1-row corpus-stats table (n_docs, avgdl).

    The search-side win is PARTITION pruning (same pattern as
    ``similarity.build_ivf_index``): a query touches only the directories
    its terms hash into — 1/n_buckets of the index per term instead of a
    corpus scan. df and dl are precomputed at build time, so a search
    never re-tokenizes anything.
    """
    toks = docs.select(F.col(id_col), spark_tokens(F.col(text_col)).alias("toks")).filter(
        F.size("toks") > 0
    )
    tf = (
        toks.select(F.col(id_col), F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    term_w = Window.partitionBy("term")
    postings = tf.withColumn("df", F.count(F.lit(1)).over(term_w)).withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
    )
    postings.write.mode("overwrite").partitionBy("bucket").parquet(f"{out_dir}/postings")
    # n_buckets rides in the stats row: the bucket function is part of the
    # index layout, so search must never have to guess it (a mismatched
    # search-time modulus would silently prune REAL postings away)
    toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.size("toks")).alias("avgdl")
    ).withColumn("n_buckets", F.lit(n_buckets)).write.mode("overwrite").parquet(
        f"{out_dir}/stats"
    )


def postings_search(spark, out_dir: str, id_col: str, query: str,
                    k1: float = 1.2, b: float = 0.75, k: int = 10) -> DataFrame:
    """Search the persisted postings index: reads ONLY the partitions the
    query's terms hash into (bucket ∈ literal list -> directory pruning,
    assertable via ``layout.scan_report``), scores BM25 from the stored
    tf/df/dl, and returns the same (id, rank, n_hit_terms, score) frame
    as ``bm25_search`` — parity-pinned in tests. The bucket modulus comes
    from the index's own stats row (never a caller parameter — a
    mismatched modulus would silently prune real postings)."""
    terms = query_terms(query)
    if not terms:
        raise ValueError("query has no tokens")
    postings, stats = _postings_index_rows(spark, out_dir, terms)
    return _bm25_rank(postings, stats, id_col, k1, b, k)


def _postings_index_rows(spark, out_dir: str, terms: list[str]):
    """Shared read path for single- and batched search over the persisted
    index: (bucket-pruned term-filtered postings rows, stats frame). The
    bucket modulus comes from the index's own stats row — never a caller
    parameter."""
    stats = spark.read.parquet(f"{out_dir}/stats")
    n_buckets = stats.select("n_buckets").first()["n_buckets"]
    stats = stats.drop("n_buckets")
    buckets = sorted(set(_term_buckets(spark, terms, n_buckets).values()))
    postings = (
        spark.read.parquet(f"{out_dir}/postings")
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    return postings, stats


def postings_search_many(spark, out_dir: str, id_col: str,
                         queries: list[tuple[int, str]],
                         k1: float = 1.2, b: float = 0.75,
                         k: int = 10) -> DataFrame:
    """Batched search over the persisted index: ONE pruned index read for
    N queries (partition pruning on the union of the queries' term
    buckets, df/dl/stats all precomputed at build time), fanned out
    per-query via the shared ``_bm25_rank_many`` tail. Per query the
    result is identical to ``postings_search`` (parity-pinned)."""
    qrows = _query_term_rows(queries)
    all_terms = sorted({t for _, t in qrows})
    qdf = spark.createDataFrame(qrows, "query_id long, term string")
    postings, stats = _postings_index_rows(spark, out_dir, all_terms)
    return _bm25_rank_many(postings, qdf, stats, id_col, k1, b, k)


def _term_buckets(spark, terms: list[str], n_buckets: int) -> dict[str, int]:
    """Driver-side pmod(xxhash64(term), n) for ALL terms in ONE tiny
    Spark job — computed through Spark so the bucket function is BY
    CONSTRUCTION the same expression the build side used (no Python
    xxhash reimplementation to drift), without paying one driver round
    trip per term."""
    rows = (
        spark.createDataFrame([(t,) for t in terms], "term string")
        .select("term", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int").alias("b"))
        .collect()
    )
    return {r["term"]: r["b"] for r in rows}


def _xxhash64_bucket(term: str, n_buckets: int) -> int:
    """Single-term convenience wrapper over ``_term_buckets`` (tests)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    return _term_buckets(spark, [term], n_buckets)[term]


def global_shuffle(docs: DataFrame, id_col: str, n_shards: int,
                   salt: str = "shuf") -> DataFrame:
    """Deterministic corpus shuffle + shard assignment — the training-data
    "global shuffle" without a global sort. Every row gets ``shard`` (a
    hash bucket of (id, salt)) and ``pos`` (its 0-based rank within the
    shard, ordered by the same hash with id tiebreak). Readers that walk
    shards in (shard, pos) order see a deterministic pseudo-random
    permutation of the corpus; training jobs interleave shards for
    cross-shard mixing.

    Why not ORDER BY rand() at 100 TB: a true global permutation is a
    full range-exchange sort over the whole corpus. The sharded form
    pays one hash exchange into ``n_shards`` groups plus an in-shard
    sort; correctness properties the full sort can't offer: the
    permutation is a pure function of (id, salt) — reproducible across
    runs, engines, partitionings — and re-drawing is a salt change, not
    an RNG seed plumbing problem.

    Pick ``n_shards`` >= cluster cores (typically 1k-100k for an LLM
    corpus) so each in-shard sort fits one task's memory and the write
    parallelizes; the per-shard window here is exactly that in-shard
    sort.
    """
    key = spark_phash(F.concat(F.col(id_col).cast("string"), F.lit("_" + salt)))
    w = Window.partitionBy("shard").orderBy(F.col("_skey").asc(), F.col(id_col).asc())
    return (
        docs.withColumn("_skey", key)
        .withColumn("shard", F.pmod(F.col("_skey"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("_skey")
    )


def concat_chunks(docs: DataFrame, id_col: str, count_col: str, seq_len: int,
                  part_col: str | None = None) -> DataFrame:
    """GPT-style sequence packing: concatenate the corpus token stream in
    deterministic (``part_col``, ``id_col``) order and cut fixed
    ``seq_len`` blocks, docs crossing block boundaries (no padding, no
    doc alignment) — the packing an autoregressive pretraining loader
    actually uses, vs ``pack_bins``' whole-doc budget bins.

    Returns one row per (doc, block) intersection: ``block`` (0-based
    within the partition), ``off_in_doc`` (first token of this doc that
    lands in the block), ``n_toks`` (tokens the doc contributes).
    Σ n_toks per block = seq_len except the final partial block.

    Scale: one cumulative-sum window per partition (callers at scale
    pass a partition column — source/date shard — so no global
    serialization) and a per-doc explode of ceil(len/seq_len)+1 block
    rows; all JVM expressions.
    """
    part = F.col(part_col) if part_col else F.lit(0)
    w = Window.partitionBy(part).orderBy(F.col(id_col).asc())
    sized = docs.filter(F.col(count_col) > 0).select(
        *( [F.col(part_col)] if part_col else [] ),
        F.col(id_col),
        F.col(count_col).cast("long").alias("_n"),
        (F.sum(count_col).over(w).cast("long")).alias("_cum"),
    )
    start = F.col("_cum") - F.col("_n")
    end = F.col("_cum")  # exclusive
    # block ids via integer `div`, not floor(double /): double division
    # loses exactness past 2^53 cumulative tokens (real at corpus scale)
    # and would diverge from the oracle's integer //
    spans = sized.withColumn("_start", start).withColumn(
        "block",
        F.explode(
            F.expr(f"sequence(_start div {int(seq_len)}, (_cum - 1) div {int(seq_len)})")
        ),
    ).drop("_start")
    blk_lo = F.col("block") * seq_len
    blk_hi = blk_lo + seq_len
    return spans.select(
        *( [F.col(part_col)] if part_col else [] ),
        F.col(id_col),
        F.col("block").cast("long"),
        (F.greatest(start, blk_lo) - start).cast("long").alias("off_in_doc"),
        (F.least(end, blk_hi) - F.greatest(start, blk_lo)).cast("long").alias("n_toks"),
    )


def pack_bins(docs: DataFrame, id_col: str, token_col: str, budget: int,
              part_col: str | None = None,
              allow_single_partition: bool = False) -> DataFrame:
    """Sequence packing: assign docs to fixed-token-budget training bins.

    Greedy-by-order packing as a window cumulative sum: docs ordered by id
    (within ``part_col`` if given) accumulate token counts; ``bin`` =
    floor((cumsum - n_tokens) / budget) — the bin the doc STARTS in. This
    is the order-preserving packing a sequence-builder uses; docs longer
    than the budget simply occupy 2+ bins' worth of budget.

    Scale: one shuffle on ``part_col``. Without a partition column the
    cumulative sum serializes the WHOLE corpus through one task, so
    ``part_col=None`` requires the caller to state
    ``allow_single_partition=True`` — an explicit opt-in that the input
    is small (a sampled subset, a per-day shard pre-filtered upstream),
    not an accident of omission.
    """
    if part_col is None and not allow_single_partition:
        raise ValueError(
            "pack_bins without part_col serializes the corpus through a "
            "single partition; pass part_col (e.g. source or a date "
            "shard) or opt in with allow_single_partition=True for "
            "known-small inputs"
        )
    w = (
        Window.partitionBy(part_col).orderBy(F.col(id_col))
        if part_col is not None
        else Window.partitionBy().orderBy(F.col(id_col))
    )
    cum = F.sum(token_col).over(w)
    # integer `div`, not floor(double /): exact at any cumulative-token
    # magnitude and identical to the oracle's integer //
    return docs.withColumn("_cumstart", (cum - F.col(token_col)).cast("long")).withColumn(
        "bin", F.expr(f"_cumstart div {int(budget)}")
    ).drop("_cumstart")


def length_quantiles(docs: DataFrame, group_col: str, value_col: str,
                     qs: tuple[float, ...] = (0.5, 0.9, 0.99)) -> DataFrame:
    """Per-group exact percentiles of a numeric column (corpus length
    distribution — the first thing a data auditor asks for). Exact
    ``percentile`` (linear interpolation) rather than approx_percentile so
    the result is engine-reproducible; at 100 TB swap to
    ``approx_percentile(…, accuracy)`` when a bounded-error answer is
    acceptable — one pass instead of a per-group sort."""
    arr = ", ".join(str(q) for q in qs)
    out = docs.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, array({arr}))").alias("_p"),
        F.count(F.lit(1)).alias("ct"),
    )
    cols = [F.col(group_col), F.col("ct")]
    for i, q in enumerate(qs):
        cols.append(F.col("_p")[i].alias(f"p{int(q * 100)}"))
    return out.select(*cols)


def bm25_terms(docs: DataFrame, id_col: str, text_col: str,
               k1: float = 1.2, b: float = 0.75, k: int = 3) -> DataFrame:
    """BM25 term scoring over the corpus: for each document, the top-``k``
    highest-BM25 terms (the retrieval/relevance primitive a training-data
    pipeline uses for query-document mining and keyword extraction).

    score(d, t) = idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),
    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))   (the Robertson form)

    Scale shape (the interesting part):
    - (doc, term, tf) via explode -> groupBy(doc, term): partial-aggregated
      map-side, shuffle carries counts not text.
    - df(term) = count() over a window partitioned by term — NOT a
      self-join against a re-aggregated copy: tf has exactly one row per
      (doc, term), so the per-term row count IS the document frequency,
      computed on the already-shuffled tf rows. A join formulation makes
      Catalyst recompute the whole tokenize/explode/agg subtree for the
      second side (no automatic CSE across a self-join) — tokenizing the
      corpus twice at 100 TB — and adds a join exchange besides.
    - corpus scalars (N, avgdl) are a 1-row aggregate cross-joined back —
      a broadcast, never a driver collect (this branch re-scans only the
      pruned text column).
    - top-k TERMS per doc = row_number window over id -> WindowGroupLimit
      partial top-k before the exchange (same pruning as topk_per_group;
      unlike the search paths, whose global doc ranking tail is
      TakeOrderedAndProject in _bm25_rank — keyed-many vs global-one).
    Total: 3 data exchanges (tf agg, term window, doc window) + the 1-row
    stats broadcast, independent of corpus size.
    """
    toks = docs.select(F.col(id_col), spark_tokens(F.col(text_col)).alias("toks")).filter(
        F.size("toks") > 0
    )
    tf = (
        toks.select(F.col(id_col), F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("toks")).alias("avgdl"),
    )
    term_w = Window.partitionBy("term")
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(term_w))
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "score",
            F.round(
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", F.col("tf").alias("tf_ct"), "score")
    )


def topk_per_group(docs: DataFrame, group_col: str, order_col: str,
                   id_col: str, k: int) -> DataFrame:
    """Curation: keep the top-``k`` rows per group by ``order_col``
    (quality-score culling per source). Deterministic via the id
    tiebreak; the physical plan is the partial top-k WindowGroupLimit
    before the exchange — per-partition pruning, never a global sort."""
    w = Window.partitionBy(group_col).orderBy(F.col(order_col).desc(), F.col(id_col).asc())
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .withColumnRenamed("_rk", "rank")
    )


def chunk_documents(docs: DataFrame, id_col: str, text_col: str,
                    size: int = 500, overlap: int = 100) -> DataFrame:
    """Split each document into overlapping character chunks — the step
    before embedding in a training/RAG pipeline. Chunk k covers
    ``[k*(size-overlap), k*(size-overlap)+size)``; the last chunk may be
    shorter; an empty/whitespace-only doc yields one empty chunk.

    All JVM-side: sequence(0, len-1, step) -> explode -> substring — no
    UDF, one Generate node, no shuffle at all (chunking is a narrow op;
    downstream groupBys pay the only exchange). At 100 TB the explode
    multiplies rows ~len/step x, but each output row carries only its
    chunk slice, so bytes grow ~(1 + overlap/size), not len/step.

    Every input column except ``text_col`` passes through (metadata like
    source/lang rides along on the narrow op — cheaper than a join back
    over the exploded rows to recover it).
    """
    if overlap >= size:
        raise ValueError("overlap must be < size")
    step = size - overlap
    ln = F.length(F.col(text_col))
    offs = F.sequence(F.lit(0), F.greatest(ln - 1, F.lit(0)), F.lit(step))
    keep = [id_col] + [c for c in docs.columns if c not in (id_col, text_col)]
    return (
        docs.select(*keep, F.col(text_col), F.explode(offs).alias("chunk_off"))
        .select(
            *keep,
            (F.col("chunk_off") / step).cast("int").alias("chunk_idx"),
            "chunk_off",
            F.substring(F.col(text_col), F.col("chunk_off") + 1, size).alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text"))
    )


def sample_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    n: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic fixed-N sample per group — the balanced-mix
    counterpart to ``split_assign``'s rate sampling: every group
    contributes at most ``n`` rows, chosen by hash rank (xxhash64 of the
    id + seed), so the pick is uniform-ish, reproducible across runs and
    partitionings, and re-drawable with a new ``seed``. Groups smaller
    than ``n`` pass through whole.

    Scale: one exchange on the group key + per-group TOP-N (Spark plans
    rank<=n as WindowGroupLimit — a partial per-partition top-n BEFORE
    the exchange), so shuffle carries at most n rows per group per
    partition, never whole groups.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        F.xxhash64(F.col(id_col), F.lit(seed)).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_srn", F.row_number().over(w))
        .filter(F.col("_srn") <= n)
        .drop("_srn")
    )
