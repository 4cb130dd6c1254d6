"""Text-analysis operators over the ``documents`` corpus (the
structural stand-in for the reference's OMOP ``NOTE_TEXT`` CLOB
column — FIXTURES.md §A): per-document statistics, quality scoring,
tokenization/token counting, language-ID heuristic, and content
fingerprinting.

[EXT] operators per SURVEY.md §2.3 — absent from the reference
(§2.2), mandated by the north-star brief for the LLM-data-pipeline
surface.

All of these are map-side-only column expressions (no shuffle except
the final optional aggregation), i.e. they scale linearly and stay
inside whole-stage codegen — the correct shape for a 100 TB corpus
profiling pass. No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.parquet import table

STOPWORDS = ("a", "the")  # present in the fixture vocabulary


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


# ---------------------------------------------------------------------------
# T01 — per-document token statistics.
# avg_token_len is derived arithmetically from chars/token counts so it
# is a deterministic single IEEE division (no aggregation noise).
# ---------------------------------------------------------------------------

T01_ORACLE = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       length(text) AS n_chars,
       (CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        / len(string_split(text, ' '))) AS avg_token_len
FROM documents
"""


@query("t01_text_stats", oracle=T01_ORACLE)
def t01_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tok = F.size(toks)
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length("text").alias("n_chars"),
        (
            (F.length("text") - (n_tok - F.lit(1))).cast("double") / n_tok
        ).alias("avg_token_len"),
    )


# ---------------------------------------------------------------------------
# T02 — quality scoring: length, lexical diversity, stopword ratio.
# The canonical pre-training corpus filter (cf. C4/Gopher rules):
# score ∈ [0,1], weighted blend of normalized signals. Expression tree
# is identical in both engines → bit-stable doubles.
# ---------------------------------------------------------------------------

T02_ORACLE = """
SELECT doc_id,
       ((0.3 * least(1.0, CAST(length(text) AS DOUBLE) / 400.0))
        + (0.4 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                  / len(string_split(text, ' '))))
        + (0.3 * (1.0 - (CAST(len(list_filter(string_split(text, ' '),
                                              w -> w = 'a' OR w = 'the')) AS DOUBLE)
                         / len(string_split(text, ' ')))))) AS quality
FROM documents
"""


@query("t02_quality_score", oracle=T02_ORACLE)
def t02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tok = F.size(toks)
    n_stop = F.size(
        F.filter(toks, lambda w: (w == STOPWORDS[0]) | (w == STOPWORDS[1]))
    )
    len_score = F.least(F.lit(1.0), F.length("text").cast("double") / F.lit(400.0))
    diversity = F.size(F.array_distinct(toks)).cast("double") / n_tok
    stop_penalty = F.lit(1.0) - (n_stop.cast("double") / n_tok)
    return docs.select(
        "doc_id",
        (
            (F.lit(0.3) * len_score)
            + (F.lit(0.4) * diversity)
            + (F.lit(0.3) * stop_penalty)
        ).alias("quality"),
    )


# ---------------------------------------------------------------------------
# T03 — token counting: whitespace tokens + a BPE-ish regex pass
# (alpha runs / digit runs / other-symbol runs), the standard cheap
# proxy for subword token counts in corpus accounting.
# ---------------------------------------------------------------------------

T03_ORACLE = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS n_bpe_tokens
FROM documents
"""


@query("t03_token_count", oracle=T03_ORACLE)
def t03_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens("text")).alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[0-9]+"), 0)
        ).alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# T04 — language-ID heuristic (char-distribution profile vote).
# A real n-gram profile model needs external tables; this is the
# self-contained deterministic variant: score each candidate language
# by marker-token overlap, argmax with alphabetical tie-break. The
# fixture corpus is synthetic word soup, so predictions are degenerate
# by construction — the operator's *shape* (map-side scoring + argmax)
# is what carries to a real corpus. Rows-only check (heuristic output,
# no meaningful SQL oracle).
# ---------------------------------------------------------------------------

LANG_MARKERS = {
    "en": ("the", "a", "fast", "slow"),
    "es": ("data", "valor", "tabla"),
    "de": ("der", "und", "schnell"),
}


@query("t04_langid")
def t04_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = tokens("text")
    scores = F.array(
        *[
            F.struct(
                (-F.size(F.filter(toks, lambda w: w.isin(*markers)))).alias(
                    "neg_score"
                ),
                F.lit(lang).alias("lang"),
            )
            for lang, markers in sorted(LANG_MARKERS.items())
        ]
    )
    # argmax: ascending sort on (-score, lang) → highest score first,
    # alphabetical tie-break — deterministic.
    best = F.sort_array(scores)[0]
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        best["lang"].alias("predicted_lang"),
        (-best["neg_score"]).alias("marker_hits"),
    )


# ---------------------------------------------------------------------------
# T05 — content fingerprinting: md5 of the normalized text, dup-group
# rollup. (Winnowing/rolling-hash fingerprints live in dedup.py where
# they feed candidate generation.)
# ---------------------------------------------------------------------------

T05_ORACLE = """
SELECT md5(lower(text)) AS fingerprint,
       MIN(doc_id) AS first_doc_id,
       COUNT(*) AS n_docs
FROM documents
GROUP BY fingerprint
"""


@query("t05_fingerprint", oracle=T05_ORACLE)
def t05_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.lower(F.col("text"))).alias("fingerprint"))
        .agg(
            F.min("doc_id").alias("first_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# T06 — stratified sampling (per-language downsampling): the curation
# step that rebalances a corpus before training. ``sampleBy`` is
# map-side Bernoulli per stratum — no shuffle, one pass, and the seed
# pins the row set per Spark build. Engine-specific RNG → rows-only
# check; per-stratum rates and determinism asserted in unit tests.
# At 100 TB this is THE way to downsample: no count-then-limit (two
# passes + skewless guarantee problems), just one seeded scan.
# ---------------------------------------------------------------------------

SAMPLE_FRACTIONS = {"en": 0.5, "de": 1.0, "fr": 0.25}
SAMPLE_SEED = 13


@query("t06_stratified_sample")
def t06_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    fractions = {l: SAMPLE_FRACTIONS.get(l, 0.1) for l in langs}
    sampled = docs.sampleBy("lang", fractions, seed=SAMPLE_SEED)
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.min("doc_id").alias("first_doc"),
    )


# ---------------------------------------------------------------------------
# T07 — vocabulary extraction: global token frequencies, top-100. The
# corpus pass that feeds tokenizer training (BPE/unigram) and OOV
# analysis. explode → two-level aggregate; the shuffle carries one row
# per distinct token (map-side partial counts), and the top-k is a
# TakeOrdered, never a global sort. Deterministic: count-desc with
# token tie-break.
# ---------------------------------------------------------------------------

VOCAB_TOP_K = 100


T07_ORACLE = f"""
SELECT w AS token, COUNT(*) AS n_occurrences,
       COUNT(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
GROUP BY w
ORDER BY n_occurrences DESC, token
LIMIT {VOCAB_TOP_K}
"""


@query("t07_vocabulary", oracle=T07_ORACLE)
def t07_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens("text")).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("token"))
        .limit(VOCAB_TOP_K)
    )
