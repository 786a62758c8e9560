"""Extension operators: temperature-based language-mixture resampling.

Multilingual training corpora are never fed at their natural language
proportions: the dominant language would drown the tail. The standard
fix (mBERT/XLM-R/mT5 lineage — "exponentially smoothed weighting",
e.g. arXiv:1911.02116 §3) samples language l with probability
proportional to p_l^alpha, alpha in (0,1), flattening the distribution
toward uniform. These two queries compute the smoothed mixture and
realize it as a deterministic hash-sample.

alpha is fixed at 0.5 — deliberately, for oracle portability: p^0.5 is
``sqrt``, the one power IEEE 754 requires to be correctly rounded, so
Spark's JVM and DuckDB's C runtime produce bit-identical values where a
general ``pow(p, 0.3)`` could differ in the last ulp. The remaining
cross-engine float hazards (5-term sum order, round/floor at a
boundary) are masked by round(..., 6) on reported shares and verified
empirically at every test SF.

Scale shape: the corpus is touched exactly twice, both map-friendly —
one partial-agg groupBy(lang) producing a LANGUAGE-CARDINALITY frame
(dozens of rows; the unpartitioned windows below run on that tiny
post-agg frame, not on the corpus), and one broadcast-join +
map-side hash filter for the realized sample. No corpus-side shuffle
anywhere; the decision for each doc is h32(doc_id:mix:lang) — the
same salted-integer-bucket contract as plans/ext_sampling.py, salted
differently so the two samplers' decisions are independent.

Reference parity: extends the reference's aggregation surface
(SURVEY.md §2.7) toward training-data curation; no reference
counterpart exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.functions import hashing as H
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: integer sampling space (shared convention with plans/ext_sampling)
MIX_MOD = 10_000
#: global scale on the realized sample: keep ~BETA of a perfectly
#: rebalanced corpus, capping upsampled strata at rate 1.0
BETA = 0.7

_TOKENS_SQL = "len(string_split(coalesce(text, ''), ' '))"
_KEY_SQL = "doc_id::VARCHAR || ':mix:' || lang"

#: the shared stats CTE both oracles build on: per-language token
#: shares and sqrt-smoothed mixture weights
_STATS_SQL = f"""
  SELECT lang, count(*) AS n_docs,
         CAST(sum({_TOKENS_SQL}) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
"""

# the sqrt-sum denominator folds over the languages in SORTED order
# (list_sort → left-to-right list_reduce): an unordered float SUM here
# is accumulation-order-dependent and a 1-ULP difference would flip
# rate_bucket's floor at an exact-boundary value — the one remaining
# cross-engine hazard the round-6 review flagged. The n_tokens total is
# an integer sum (exact in any order) and every other step is a single
# correctly-rounded IEEE op on identical inputs.
_WEIGHTED_SQL = f"""
  SELECT lang, n_docs, n_tokens, p,
         sqrt(p) / (
           SELECT list_reduce(
                    list_transform(
                      list_sort(list({{'lang': lang, 'sp': sqrt(p)}})),
                      x -> x.sp),
                    (a, b) -> a + b)
           FROM (
             SELECT lang, n_tokens::DOUBLE / sum(n_tokens) OVER () AS p
             FROM ({_STATS_SQL})
           )
         ) AS w
  FROM (
    SELECT lang, n_docs, n_tokens,
           n_tokens::DOUBLE / sum(n_tokens) OVER () AS p
    FROM ({_STATS_SQL})
  )
"""

MIXTURE_ORACLE = f"""
SELECT lang, n_docs, n_tokens,
       round(p, 6) AS token_share,
       round(w, 6) AS mix_weight,
       CAST(floor(least(1.0, {BETA} * w / p) * {MIX_MOD}) AS BIGINT) AS rate_bucket
FROM ({_WEIGHTED_SQL})
"""

_KEY_D_SQL = "d.doc_id::VARCHAR || ':mix:' || d.lang"

RESAMPLE_ORACLE = f"""
WITH rates AS (
  SELECT lang, CAST(floor(least(1.0, {BETA} * w / p) * {MIX_MOD}) AS BIGINT) AS rate_bucket
  FROM ({_WEIGHTED_SQL})
)
SELECT d.doc_id, d.lang, d.source,
       {H.h32_sql(_KEY_D_SQL)} % {MIX_MOD} AS mix_bucket
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE {H.h32_sql(_KEY_D_SQL)} % {MIX_MOD} < r.rate_bucket
"""


def _weighted(docs: DataFrame) -> DataFrame:
    """(lang, n_docs, n_tokens, p, w) — one corpus-side partial agg,
    then unpartitioned windows over the language-cardinality result."""
    stats = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.coalesce("text", F.lit("")), " "))).alias("n_tokens"),
    )
    everything = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    with_p = stats.select(
        "lang",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.sum("n_tokens").over(everything)).alias(
            "p"
        ),
    )
    # denominator via a SORTED left-to-right fold, not an unordered
    # float sum — see the _WEIGHTED_SQL comment (cross-engine ULP)
    sp = with_p.withColumn("sp", F.sqrt("p"))
    den = F.aggregate(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("lang", "sp")).over(everything)
            ),
            lambda x: x["sp"],
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return sp.withColumn("w", F.col("sp") / den).drop("sp")


def _rate_bucket() -> F.Column:
    return F.floor(
        F.least(F.lit(1.0), F.lit(BETA) * F.col("w") / F.col("p")) * MIX_MOD
    ).cast("long")


@register("ext_mixture_weights", oracle=MIXTURE_ORACLE)
def ext_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language smoothed mixture: natural token share p, sampling
    weight w ∝ sqrt(p), and the integer keep-threshold realizing
    min(1, BETA·w/p) over MIX_MOD hash buckets."""
    docs = load_table(spark, sf_dir, "documents")
    return _weighted(docs).select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round("p", 6).alias("token_share"),
        F.round("w", 6).alias("mix_weight"),
        _rate_bucket().alias("rate_bucket"),
    )


@register("ext_mixture_resample", oracle=RESAMPLE_ORACLE)
def ext_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The realized mixture: deterministic per-doc keep decision
    h32(doc_id:mix:lang) % MOD < rate_bucket(lang). The rates frame is
    language-cardinality and broadcast; the corpus is filtered map-side
    with zero corpus shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    rates = _weighted(docs).select("lang", _rate_bucket().alias("rate_bucket"))
    bucket = (
        H.h32(F.concat(F.col("doc_id").cast("string"), F.lit(":mix:"), F.col("lang")))
        % MIX_MOD
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .where(bucket < F.col("rate_bucket"))
        .select("doc_id", "lang", "source", bucket.alias("mix_bucket"))
    )
