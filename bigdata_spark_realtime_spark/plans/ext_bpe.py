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
-- linear zip-unnest + lead() pair derivation (the lateral range-join
-- with t[i+1] indexing carries the full token list per pair row —
-- quadratic in document width; see plans/ext_lm.py LM_ORACLE)
tok AS (
  SELECT doc_id, unnest(t) AS w, unnest(range(len(t))) AS i FROM toks
),
pairs AS (
  SELECT w AS w1, lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
  FROM tok
  QUALIFY w2 IS NOT NULL
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


# ---------------------------------------------------------------------------
# merge application — the second half of the BPE training iteration
# ---------------------------------------------------------------------------

APPLY_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t
  FROM documents WHERE text IS NOT NULL
),
tok AS (
  SELECT doc_id, unnest(t) AS w, unnest(range(len(t))) AS i FROM toks
),
pairs AS (
  -- linear pair stream (see BPE_ORACLE note); i is the 0-based
  -- position of w1, exactly as the old range(len(t) - 1) join emitted
  SELECT doc_id, w AS w1,
         lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2, i
  FROM tok
  QUALIFY w2 IS NOT NULL
),
top1 AS (
  SELECT w1, w2 FROM (
    SELECT w1, w2, count(*) AS c FROM pairs GROUP BY w1, w2
  ) ORDER BY c DESC, w1, w2 LIMIT 1
),
hits AS (
  SELECT p.doc_id, p.i
  FROM pairs p JOIN top1 ON p.w1 = top1.w1 AND p.w2 = top1.w2
),
runs AS (
  SELECT doc_id,
         i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
  FROM hits
),
merged AS (
  SELECT doc_id, CAST(sum((cnt + 1) // 2) AS BIGINT) AS n_merges
  FROM (SELECT doc_id, grp, count(*) AS cnt FROM runs
        GROUP BY doc_id, grp)
  GROUP BY doc_id
)
SELECT tk.doc_id,
       CAST(len(tk.t) AS BIGINT) AS n_tokens,
       CAST(coalesce(m.n_merges, 0) AS BIGINT) AS n_merges,
       CAST(len(tk.t) - coalesce(m.n_merges, 0) AS BIGINT)
         AS n_tokens_after
FROM toks tk LEFT JOIN merged m USING (doc_id)
"""


@register("ext_bpe_apply_merge", oracle=APPLY_ORACLE)
def ext_bpe_apply_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second half of the BPE training iteration: apply the
    census's top-1 merge to the corpus with standard leftmost
    non-overlapping semantics, reporting per-doc token counts before /
    after (the statistic the trainer's stopping rule and compression
    telemetry consume; the rewritten stream itself is the same rows
    with the merged symbol substituted).

    Leftmost non-overlap matters only for self-pairs (w1 == w2): a run
    of k adjacent occurrences yields ceil(k/2) merges — the oracle
    counts runs via the gaps-and-islands window, the Spark side scans
    positions with an ``aggregate`` struct fold carrying the last
    merge position. For w1 != w2 adjacent occurrences can never
    overlap and both forms reduce to a plain count.

    Scale (100 TB): the merge pair is the census's top-1 row — a
    1-row model artifact collected and re-entered as literals (the
    centroid/DSIR pattern); the application pass is pure map-side
    JVM array work (filter + fold over each doc's own tokens, no
    exchange at all). At tokenizer-vocab scale the per-element
    lambda swaps for the shared Arrow pair kernel; at 64-token docs
    the codegen fold wins by skipping Python."""
    from bigdata_spark_realtime_spark.operators.shingling import (
        token_pair_rows,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    top = (
        token_pair_rows(
            docs, min_parallelism=spark.sparkContext.defaultParallelism
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w1", "w2")
        .limit(1)
        .collect()
    )
    if not top:
        # no adjacent pair anywhere (every doc < 2 tokens): nothing to
        # merge — mirror the oracle, whose empty top1 yields 0 merges
        t0 = F.split("text", " ")
        n0 = F.size(t0).cast("bigint")
        return docs.select(
            "doc_id",
            n0.alias("n_tokens"),
            F.lit(0).cast("bigint").alias("n_merges"),
            n0.alias("n_tokens_after"),
        )
    w1, w2 = top[0]["w1"], top[0]["w2"]

    # materialize the token array below the position filter: an inline
    # split referenced by element_at inside the interpreted lambda
    # would be re-evaluated per position — O(width²) per document (see
    # ext_text.ext_text_fingerprint; wide-record boundary sweep catch)
    docs = docs.select("doc_id", F.split("text", " ").alias("toks"))
    t = F.col("toks")
    n_tokens = F.size(t).cast("bigint")
    positions = F.when(
        F.size(t) < 2, F.array().cast("array<int>")
    ).otherwise(
        F.filter(
            F.sequence(F.lit(0), F.size(t) - 2),
            lambda i: (F.element_at(t, i + 1) == F.lit(w1))
            & (F.element_at(t, i + 2) == F.lit(w2)),
        )
    )
    zero = F.struct(
        F.lit(-2).cast("int").alias("prev"),
        F.lit(0).cast("bigint").alias("cnt"),
    )
    n_merges = F.aggregate(
        positions,
        zero,
        lambda acc, p: F.when(p == acc["prev"] + 1, acc).otherwise(
            F.struct(p.alias("prev"), (acc["cnt"] + 1).alias("cnt"))
        ),
    )["cnt"]
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_merges.alias("n_merges"),
        (n_tokens - n_merges).alias("n_tokens_after"),
    )
