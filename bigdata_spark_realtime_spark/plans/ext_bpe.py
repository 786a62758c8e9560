"""BPE merge-candidate counting over the `documents` table.

The inner loop of byte-pair-encoding tokenizer training (Sennrich et
al. 2016, the construction behind GPT/Llama tokenizers) is: count every
adjacent symbol pair in the corpus, merge the most frequent, repeat.
This operator is one iteration of that loop at token granularity — the
top-K adjacent token pairs by raw occurrence count — which is also the
collocation census a tokenizer-sizing or stopword-phrase analysis runs.
The reference repo has no tokenizer surface (its text ops end at the
keyword filter); this extends the engine's text-analysis family
(SURVEY.md §2 ext: token counting "BPE-ish") to the training step.

Distinct from `ext_text_boilerplate_ngrams`, which ranks 3-gram
DOCUMENT frequency (count_distinct docs — boilerplate detection); BPE
merges rank raw PAIR occurrences (in-doc repetition counts fully).

Scale (100 TB): pairs are emitted map-side by the shared Arrow kernel
(operators/shingling.token_pair_rows — the token stream itself is never
shuffled as text beyond the (w1, w2) rows), the count is one groupBy
with map-side partial aggregation, and the top-K compiles to
TakeOrderedAndProject (per-partition top-K then a K-row merge on one
reducer) — never a global sort. A full BPE trainer iterates this plan
with a merge applied between rounds; each round is the same shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: merge candidates returned (one training iteration inspects few)
TOP_MERGES = 20

BPE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t
  FROM documents WHERE text IS NOT NULL
),
pairs AS (
  SELECT t[i + 1] AS w1, t[i + 2] AS w2
  FROM toks, unnest(range(len(t) - 1)) AS u(i)
  WHERE len(t) >= 2
),
cnt AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_count
  FROM pairs GROUP BY w1, w2
)
SELECT w1, w2, pair_count,
       CAST(row_number() OVER (ORDER BY pair_count DESC, w1, w2) AS INT)
         AS rnk
FROM cnt
QUALIFY rnk <= {TOP_MERGES}
"""


@register("ext_bpe_merges", oracle=BPE_ORACLE)
def ext_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K adjacent token pairs by occurrence count — one
    BPE training iteration's merge census. Ties broken (w1, w2)
    ascending; tokens are ASCII so Spark and DuckDB binary string
    orders agree."""
    from bigdata_spark_realtime_spark.operators.shingling import (
        token_pair_rows,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    cnt = (
        token_pair_rows(
            docs,
            min_parallelism=spark.sparkContext.defaultParallelism,
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
    # orderBy(...).limit(K) compiles to TakeOrderedAndProject (pinned in
    # tests/test_plan_hygiene.py); the rank window then orders only the
    # K surviving rows
    topk = cnt.orderBy(F.desc("pair_count"), "w1", "w2").limit(TOP_MERGES)
    w = Window.orderBy(F.desc("pair_count"), "w1", "w2")
    return topk.select(
        "w1",
        "w2",
        "pair_count",
        F.row_number().over(w).cast("int").alias("rnk"),
    )
