"""Per-language vocabulary census over the `documents` table.

The first step of any per-language tokenizer build, stopword-list
derivation, or corpus language audit: the top-K tokens by occurrence
count WITHIN each language. Complements the global views the engine
already has — `ext_text_token_stats` (per-doc counts),
`ext_bpe_merges` (global pair census), `ext_text_tfidf` (per-doc
keywords) — with the grouped-leaderboard shape (the reference's A2/A4
"top-K within group" pattern applied to the corpus surface).

Scale (100 TB): the token explode is map-side (filter sits before
it); the (lang, token) count has map-side partial aggregation, so the
shuffle carries vocabulary-sized — not corpus-sized — data. The
per-language rank window runs on the POST-aggregation rows:
vocabulary x languages, millions of rows at worst, and partitions by
`lang` whose skew is bounded by vocabulary size, not document count.
No global sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: leaderboard depth per language
TOP_TOKENS = 15

VOCAB_ORACLE = f"""
WITH toks AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token
  FROM documents
  WHERE text IS NOT NULL AND lang IS NOT NULL
),
cnt AS (
  SELECT lang, token, CAST(count(*) AS BIGINT) AS token_count
  FROM toks WHERE token <> '' GROUP BY lang, token
)
SELECT lang, token, token_count,
       CAST(row_number() OVER (PARTITION BY lang
                               ORDER BY token_count DESC, token)
            AS INT) AS rnk
FROM cnt
QUALIFY rnk <= {TOP_TOKENS}
"""


@register("ext_vocab_topk_lang", oracle=VOCAB_ORACLE)
def ext_vocab_topk_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} tokens per language by raw occurrence count. Ties
    break on token ascending; tokens are ASCII so Spark and DuckDB
    binary string orders agree (same contract as `ext_bpe_merges`)."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    cnt = (
        docs.select(
            "lang", F.explode(F.split("text", " ")).alias("token")
        )
        .where(F.col("token") != "")
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("token_count"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("token_count"), F.asc("token")
    )
    return (
        cnt.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= TOP_TOKENS)
    )
