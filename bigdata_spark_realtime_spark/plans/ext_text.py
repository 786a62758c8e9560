"""Extension operators: text analysis over the `documents` table.

Language-ID (marker-token heuristic), quality scoring, token counting
(whitespace + BPE-ish regex) and document fingerprinting — all built
from JVM-side string/array functions with exact DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.functions import hashing as H
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# token counting: whitespace tokens + a BPE-ish regex token count
# ---------------------------------------------------------------------------

#: word pieces / digits / single punctuation — a crude BPE-style segmenter
BPE_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

TOKEN_ORACLE = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{BPE_RE}')) AS n_bpe_tokens,
       length(text) AS n_chars_actual
FROM documents
"""


@register("ext_text_token_stats", oracle=TOKEN_ORACLE)
def ext_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ", -1)).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_RE), 0)).cast("long").alias(
            "n_bpe_tokens"
        ),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


# ---------------------------------------------------------------------------
# language-ID: n-gram/marker-token heuristic. Score per language = number
# of tokens in that language's marker set; argmax with deterministic
# tie-break (higher score wins; ties → marker-list order).
# ---------------------------------------------------------------------------

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "und", "ein"),
    "fr": ("le", "la", "et", "un"),
    "es": ("el", "los", "y", "una"),
    "zh": ("的", "了", "是", "在"),
}


def _score_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return f"len(list_filter(string_split(text, ' '), t -> t IN ({markers})))"


_LANG_CASE = "CASE " + " ".join(
    f"WHEN s_{lang} = best AND best > 0 THEN '{lang}'" for lang in LANG_MARKERS
) + " ELSE 'und' END"

LANG_ORACLE = f"""
SELECT doc_id, lang AS labeled_lang, {_LANG_CASE} AS predicted_lang
FROM (
  SELECT doc_id, lang,
         {', '.join(f'{_score_sql(lang)} AS s_{lang}' for lang in LANG_MARKERS)},
         greatest({', '.join(f'{_score_sql(lang)}' for lang in LANG_MARKERS)}) AS best
  FROM documents
)
"""


@register("ext_text_lang_id", oracle=LANG_ORACLE)
def ext_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = None
    for lang in LANG_MARKERS:
        cond = (scores[lang] == best) & (best > 0)
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    pred = pred.otherwise("und")
    return docs.select(
        "doc_id", F.col("lang").alias("labeled_lang"), pred.alias("predicted_lang")
    )


# ---------------------------------------------------------------------------
# quality scoring: length / punctuation / stopword-ratio features and a
# composite score (the usual C4/Gopher-style cheap filters)
# ---------------------------------------------------------------------------

STOPWORDS = ("the", "a", "and", "of", "to", "in")
_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)

QUALITY_ORACLE = f"""
SELECT doc_id,
       n_tokens,
       round(stop_ct / n_tokens, 4) AS stopword_ratio,
       round(punct_ct / n_chars, 4) AS punct_ratio,
       round(n_chars / n_tokens, 4) AS mean_token_len,
       CASE WHEN n_tokens >= 10 AND stop_ct / n_tokens >= 0.05
                 AND punct_ct / n_chars <= 0.2 THEN 1 ELSE 0 END AS keep
FROM (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(list_filter(string_split(text, ' '), t -> t IN ({_STOP_IN}))) AS DOUBLE) AS stop_ct,
         CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE) AS punct_ct
  FROM documents
  WHERE length(text) > 0
)
"""


@register("ext_text_quality_score", oracle=QUALITY_ORACLE)
def ext_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    toks = F.split("text", " ")
    feats = docs.select(
        "doc_id",
        F.size(toks).cast("double").alias("n_tokens"),
        F.length("text").cast("double").alias("n_chars"),
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
        .cast("double")
        .alias("stop_ct"),
        F.size(F.regexp_extract_all("text", F.lit("[^A-Za-z0-9 ]"), 0))
        .cast("double")
        .alias("punct_ct"),
    )
    keep = (
        (F.col("n_tokens") >= 10)
        & (F.col("stop_ct") / F.col("n_tokens") >= 0.05)
        & (F.col("punct_ct") / F.col("n_chars") <= 0.2)
    )
    return feats.select(
        "doc_id",
        F.col("n_tokens"),
        F.round(F.col("stop_ct") / F.col("n_tokens"), 4).alias("stopword_ratio"),
        F.round(F.col("punct_ct") / F.col("n_chars"), 4).alias("punct_ratio"),
        F.round(F.col("n_chars") / F.col("n_tokens"), 4).alias("mean_token_len"),
        F.when(keep, 1).otherwise(0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# document fingerprinting: normalized-text md5 + winnowed shingle minimum
# (rolling-hash fingerprint family)
# ---------------------------------------------------------------------------

from bigdata_spark_realtime_spark.plans.corpus import NORM_SQL, norm_text  # noqa: E402

FP_ORACLE = f"""
SELECT doc_id,
       md5({NORM_SQL}) AS fingerprint,
       list_min(list_transform({H.shingles_sql('toks', 5)},
                s -> {H.h32_sql('s')})) AS winnow_min
FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
WHERE len(toks) >= 5
"""


@register("ext_text_fingerprint", oracle=FP_ORACLE)
def ext_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document fingerprint (normalized md5) + winnowing-style
    minimum over rolling 5-token shingle hashes.

    ``toks`` is MATERIALIZED in a lower projection before the shingle
    transform: higher-order-function lambdas are interpreted, so an
    inline ``split`` referenced by ``element_at`` inside the lambda is
    re-evaluated for EVERY element — O(width²) per document (one 1 MiB
    doc burned >12 CPU-minutes in the wide-record boundary sweep).
    The multi-reference, non-cheap alias blocks CollapseProject from
    re-inlining it (pinned in tests/test_round15_property2.py)."""
    docs = load_table(spark, sf_dir, "documents")
    docs = docs.select(
        "doc_id", "text", F.split("text", " ").alias("toks")
    )
    toks = F.col("toks")
    return docs.where(F.size(toks) >= 5).select(
        "doc_id",
        F.md5(norm_text(F.col("text"))).alias("fingerprint"),
        F.array_min(F.transform(H.shingles(toks, 5), lambda s: H.h32(s))).alias(
            "winnow_min"
        ),
    )
