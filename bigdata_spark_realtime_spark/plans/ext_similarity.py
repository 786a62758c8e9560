"""Extension operators: similarity search over embedding columns.

Brute-force cosine top-k is the exact baseline; the bucketed variant
restricts the scan to the query's coarse cell (here the `label` column —
in production a KMeans/IVF assignment, see ``operators/similarity.py``)
— the 100 TB path, since it prunes the candidate set before the shuffle.

Scoring runs through the vectorized numpy kernels in
``operators/vector_ops.py`` (one Arrow batch → one BLAS matrix product;
~100× the interpreted zip_with/aggregate fold's throughput per that
module's measurements). The fold form (plans/ext_dedup.cosine) remains
the oracle-portable reference; tie semantics — rank by the ROUNDED
similarity, neighbor_id ascending — are identical on both paths, so the
hash gate sees the same rows either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.corpus import emb_double
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

N_QUERIES = 10
TOP_K = 5

#: NULL-vector rows participate in NO vector op (the engine's
#: emb_double drops them before the kernels) — the oracle filters
#: them explicitly because DuckDB would otherwise rank NULL cos_sims
#: (or crash list_cosine_similarity) instead of skipping the row
_PAIR_SQL = """
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) AS cos_sim
  FROM embeddings q JOIN embeddings c ON {join_cond} q.vec_id <> c.vec_id
  WHERE q.vec_id < {n}
    AND q.embedding IS NOT NULL AND c.embedding IS NOT NULL
"""

BRUTE_ORACLE = f"""
SELECT query_id, neighbor_id, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM ({_PAIR_SQL.format(join_cond='', n=N_QUERIES)})
) WHERE rn <= {TOP_K}
"""


def _topk(pairs: DataFrame) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim")
    )


@register("ext_ann_bruteforce_topk", oracle=BRUTE_ORACLE)
def ext_ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k: the bounded query set ships to every task as an
    in-memory matrix; the corpus streams through mapInPandas, each Arrow
    batch scored with one Q @ C.T and reduced to its per-query top-k, so
    only k × n_batches × n_queries rows reach the global rank window.
    (The N_QUERIES-row driver fetch is the same bounded broadcast the
    previous fold-based plan did JVM-side.)"""
    from bigdata_spark_realtime_spark.operators.vector_ops import (
        topk_neighbors_broadcast,
    )

    emb = emb_double(load_table(spark, sf_dir, "embeddings"))
    queries_pdf = (
        emb.where(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding").toPandas()
    )
    pairs = topk_neighbors_broadcast(emb, queries_pdf, TOP_K)
    return _topk(pairs)


BUCKETED_ORACLE = f"""
SELECT query_id, neighbor_id, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM ({_PAIR_SQL.format(join_cond='q.label = c.label AND', n=N_QUERIES)})
) WHERE rn <= {TOP_K}
"""


@register("ext_ann_bucketed_topk", oracle=BUCKETED_ORACLE)
def ext_ann_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style search: only the query's own cell is scanned (cell id =
    `label`; a trained coarse quantizer at scale). Each cell is one
    Arrow batch — one shuffle on the cell key, one matrix product per
    cell, never all-pairs. Single-assignment cells partition the corpus,
    so the per-cell top-k IS the global top-k."""
    from bigdata_spark_realtime_spark.operators.vector_ops import (
        topk_neighbors_blocked,
    )

    emb = emb_double(load_table(spark, sf_dir, "embeddings"))
    q = emb.where(F.col("vec_id") < N_QUERIES)
    return topk_neighbors_blocked(emb, q, TOP_K, block_col="label")
