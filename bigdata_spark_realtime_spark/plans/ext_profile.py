"""Corpus profiling: dataset-card statistics and cross-source overlap.

Two dataset-insight operators a curation pipeline runs before and after
every transformation (the "data card" numbers in corpus papers — e.g.
The Pile / RefinedWeb report per-source token counts and length
distributions, and cross-source duplicate audits):

- ``ext_corpus_profile``: per (lang, source) — doc count, token totals,
  min/max and an integer-exact median token count.
- ``ext_source_overlap``: which source PAIRS share verbatim W-token
  windows — the cross-source boilerplate/mirror audit run before
  mixture weights are trusted (window granularity, not whole-doc
  fingerprints, because mirrored dumps rarely match byte-for-byte
  after per-source cleaning).

Determinism: the median is computed from the two middle elements by
rank — ``(lo + hi) DIV 2`` in pure integer arithmetic — instead of
``percentile``/``median`` built-ins, whose interpolation happens in
floats and differs in spelling across engines. Rank ties break on
doc_id, so both engines pick identical middle elements.

Scale (100 TB):
- profile: one shuffle on the (lang, source) group key; the median's
  rank window partitions by the same key, so AQE reuses the exchange;
  output is one row per group (thousands, not billions).
- overlap: windows are hashed map-side by the shared Arrow kernel
  keyed directly by source (no corpus-scale join back to documents);
  one shuffle to distinct (h, source), a self-join on h whose per-key
  fan-out is bounded by sources-per-window (≤ |sources|, a
  catalog-sized constant, so no quadratic blow-up), and a
  source-pair-sized result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

PROFILE_ORACLE = """
WITH sized AS (
  SELECT doc_id, lang, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
ranked AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY lang, source ORDER BY n_tokens, doc_id
         ) AS rnk,
         count(*) OVER (PARTITION BY lang, source) AS c
  FROM sized
)
SELECT lang, source,
       max(c) AS n_docs,
       sum(n_tokens) AS total_tokens,
       min(n_tokens) AS min_tokens,
       max(n_tokens) AS max_tokens,
       CAST((max(CASE WHEN rnk = (c + 1) // 2 THEN n_tokens END)
           + max(CASE WHEN rnk = (c + 2) // 2 THEN n_tokens END)) // 2
         AS BIGINT) AS median_tokens
FROM ranked
GROUP BY lang, source
"""

# DuckDB sum() widens to HUGEINT -> float64 in pandas; re-cast
PROFILE_ORACLE = PROFILE_ORACLE.replace(
    "sum(n_tokens) AS total_tokens",
    "CAST(sum(n_tokens) AS BIGINT) AS total_tokens",
).replace("max(c) AS n_docs", "CAST(max(c) AS BIGINT) AS n_docs")


@register("ext_corpus_profile", oracle=PROFILE_ORACLE)
def ext_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-card stats per (lang, source): doc/token counts, min/max and
    integer-exact median token count (middle elements by rank — no
    float interpolation, so the oracle matches bit-for-bit)."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "lang",
        "source",
        F.size(F.split("text", " ", -1)).cast("long").alias("n_tokens"),
    )
    grp = Window.partitionBy("lang", "source")
    ranked = sized.select(
        "*",
        F.row_number().over(grp.orderBy("n_tokens", "doc_id")).alias("rnk"),
        F.count(F.lit(1)).over(grp).alias("c"),
    )
    return ranked.groupBy("lang", "source").agg(
        F.max("c").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
        F.expr(
            "(max(CASE WHEN rnk = (c + 1) DIV 2 THEN n_tokens END)"
            " + max(CASE WHEN rnk = (c + 2) DIV 2 THEN n_tokens END)) DIV 2"
        ).alias("median_tokens"),
    )


OVERLAP_ORACLE = f"""
WITH fp AS (
  SELECT DISTINCT {{h_sql}} AS h, source
  FROM (
    SELECT source, unnest({{shingles_sql}}) AS g
    FROM (SELECT source, string_split(text, ' ') AS t FROM documents)
    WHERE len(t) >= {{w}}
  )
)
SELECT a.source AS source_a, b.source AS source_b,
       count(*) AS n_shared_windows
FROM fp a JOIN fp b ON a.h = b.h AND a.source < b.source
GROUP BY a.source, b.source
"""


def _overlap_oracle() -> str:
    from bigdata_spark_realtime_spark.functions import hashing as H
    from bigdata_spark_realtime_spark.plans.ext_substring import SPAN_W

    return OVERLAP_ORACLE.format(
        h_sql=H.h32_sql("g"), shingles_sql=H.shingles_sql("t", SPAN_W), w=SPAN_W
    )


@register("ext_source_overlap", oracle=_overlap_oracle())
def ext_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source boilerplate audit: for each source pair, how many
    distinct W-token windows (the substring-dedup granularity, SPAN_W
    shared with ext_dedup_substring) occur verbatim in both sources.
    Windows are hashed map-side by the shared Arrow kernel keyed
    directly by source — no corpus-scale join back to documents; the
    self-join fan-out per window is bounded by |sources| (a
    catalog-sized constant), never by corpus size."""
    from bigdata_spark_realtime_spark.operators.shingling import window_hash_rows
    from bigdata_spark_realtime_spark.plans.ext_substring import SPAN_W

    docs = load_table(spark, sf_dir, "documents")
    fp = window_hash_rows(
        docs,
        SPAN_W,
        min_parallelism=spark.sparkContext.defaultParallelism,
        key_col="source",
        key_type="string",
    ).distinct()
    a = fp.select("h", F.col("source").alias("source_a"))
    b = fp.select("h", F.col("source").alias("source_b"))
    return (
        a.join(b, "h")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_windows"))
    )
