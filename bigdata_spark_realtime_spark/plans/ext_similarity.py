"""Extension operators: similarity search over embedding columns.

Brute-force cosine top-k is the exact baseline; the bucketed variant
restricts the scan to the query's coarse cell (here the `label` column —
in production a KMeans/IVF assignment, see ``operators/similarity.py``)
— the 100 TB path, since it prunes the candidate set before the shuffle.

All vector math runs JVM-side (zip_with/aggregate fold over
array<double>), no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.ext_dedup import cosine, emb_double
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

N_QUERIES = 10
TOP_K = 5

_PAIR_SQL = """
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) AS cos_sim
  FROM embeddings q JOIN embeddings c ON {join_cond} q.vec_id <> c.vec_id
  WHERE q.vec_id < {n}
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
    """Exact top-k: broadcast the query set against the full corpus; one
    pass, partial top-k per partition via the rank window."""
    emb = emb_double(load_table(spark, sf_dir, "embeddings"))
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("e_q")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("e_c"))
    pairs = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("e_q"), F.col("e_c")), 4).alias("cos_sim"),
        )
    )
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
    `label`; a trained coarse quantizer at scale). Equi-join on the cell
    key means Spark shuffles per-cell, never all-pairs."""
    emb = emb_double(load_table(spark, sf_dir, "embeddings"))
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("label").alias("cell"),
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("e_q"),
    )
    c = emb.select(
        F.col("label").alias("cell_c"),
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("e_c"),
    )
    pairs = (
        c.join(
            F.broadcast(q),
            (F.col("cell") == F.col("cell_c"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("e_q"), F.col("e_c")), 4).alias("cos_sim"),
        )
    )
    return _topk(pairs)
