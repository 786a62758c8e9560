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


#: integer share scale (parts-per-million) and vocab-size checkpoints
COVERAGE_SCALE = 1_000_000
CHECKPOINTS = (10, 100, 1000)

COVERAGE_ORACLE = f"""
WITH toks AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token
  FROM documents
  WHERE text IS NOT NULL AND lang IS NOT NULL
),
cnt AS (
  SELECT lang, token, CAST(count(*) AS BIGINT) AS c
  FROM toks WHERE token <> '' GROUP BY lang, token
),
ranked AS (
  SELECT lang, c,
         CAST(row_number() OVER (PARTITION BY lang
                                 ORDER BY c DESC, token) AS BIGINT)
           AS rnk
  FROM cnt
),
cum AS (
  SELECT lang, rnk,
         CAST(sum(c) OVER (PARTITION BY lang ORDER BY rnk) AS BIGINT)
           AS cumc
  FROM ranked
),
stats AS (
  SELECT lang, max(rnk) AS vocab_size, max(cumc) AS total
  FROM cum GROUP BY lang
),
cp AS (
  SELECT s.lang, s.vocab_size, s.total,
         CAST(u.n AS INT) AS vocab_n,
         least(CAST(u.n AS BIGINT), s.vocab_size) AS pick_rnk
  FROM stats s, unnest([{", ".join(str(n) for n in CHECKPOINTS)}]) AS u(n)
)
SELECT cp.lang, cp.vocab_n,
       ({COVERAGE_SCALE} * cum.cumc) // cp.total AS coverage_ppm,
       cp.vocab_size
FROM cp JOIN cum ON cum.lang = cp.lang AND cum.rnk = cp.pick_rnk
"""


@register("ext_vocab_coverage", oracle=COVERAGE_ORACLE)
def ext_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus share (parts-per-million, integer-exact) covered by the
    top-N tokens per language at N = 10 / 100 / 1000 — the coverage
    curve that sizes a tokenizer vocabulary or stopword list (OOV rate
    = 1 − coverage).

    Scale (100 TB): everything past the one corpus-sized exchange
    (the (lang, token) count, collapsed map-side) runs on
    vocabulary-sized rows: rank window, running-sum window, per-lang
    stats, and a (lang, rnk) equi-join to pick each checkpoint row.
    Totals are the running sum's last value (``max(cumc)``) — no
    second corpus pass. Shares use ``(SCALE * cum) DIV total`` so
    both engines produce identical integers."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    cnt = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_rank = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("token"))
    ranked = cnt.select(
        "lang",
        "c",
        F.row_number().over(w_rank).cast("bigint").alias("rnk"),
    )
    w_cum = Window.partitionBy("lang").orderBy("rnk")
    cum = ranked.select(
        "lang", "rnk", F.sum("c").over(w_cum).alias("cumc")
    )
    stats = cum.groupBy("lang").agg(
        F.max("rnk").alias("vocab_size"), F.max("cumc").alias("total")
    )
    cp = stats.select(
        "lang",
        "vocab_size",
        "total",
        F.explode(
            F.array(*[F.lit(n) for n in CHECKPOINTS])
        ).alias("vocab_n"),
    ).withColumn(
        "pick_rnk",
        F.least(F.col("vocab_n").cast("bigint"), F.col("vocab_size")),
    )
    return (
        cp.join(
            cum.select(
                F.col("lang").alias("lang_c"), "rnk", "cumc"
            ),
            (F.col("lang") == F.col("lang_c"))
            & (F.col("rnk") == F.col("pick_rnk")),
        )
        .select(
            "lang",
            F.col("vocab_n").cast("int").alias("vocab_n"),
            F.expr(f"({COVERAGE_SCALE} * cumc) DIV total").alias(
                "coverage_ppm"
            ),
            "vocab_size",
        )
    )
