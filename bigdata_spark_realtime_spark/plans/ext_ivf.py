"""Extension operator: IVF ANN search through the REAL quantizer path.

``ext_ann_bucketed_topk`` (plans/ext_similarity.py) demonstrates the
cell-local scan with the parquet `label` column standing in for the
coarse quantizer. This module oracle-gates the actual IVF machinery in
``operators/similarity.py`` — centroid set → nearest-centroid
assignment → per-query n_probe cell selection → cell-local vectorized
scoring — with DETERMINISTIC SEEDED CENTROIDS (a filtered, ordered,
limited slice of the corpus) instead of trained KMeans, so DuckDB can
replay the identical index and the driver's hash gate covers every
stage of the probe path.

At 100 TB: centroids are 16 rows (broadcast); assignment is a map-side
argmin over the broadcast set; probing restricts each query's scan to
n_probe/n_cells of the corpus; scoring is one BLAS product per cell
(operators/vector_ops.topk_neighbors_blocked). Nothing all-pairs,
nothing driver-side. A trained quantizer (build_ivf_index, pyspark.ml
KMeans) slots into the same interfaces and is recall-tested in
tests/test_similarity_ivf.py; training is the only non-SQL-replayable
stage, which is exactly why the gate uses the seeded variant.

Reference parity: the reference has no ANN surface; this extends the
engine for embedding-era training-data curation (SURVEY.md §2 ext).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.corpus import emb_double
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

N_QUERIES = 10
TOP_K = 5
N_CELLS = 16
N_PROBE = 4
STRIDE = 31  # centroid picks: vec_id ≡ OFFSET (mod STRIDE), first N_CELLS
OFFSET = 7

# The oracle replays the whole index: same centroid slice, same
# argmin-by-(distance, cell) assignment, same n_probe selection, then
# exact brute-force truth restricted to the probed cells.
#
# The assignment distance is the SAME left-to-right squared-L2 fold the
# Spark side computes (operators/similarity._sq_dist) — NOT DuckDB's
# list_distance: sqrt(own-order accumulation) is monotone in exact
# arithmetic but can order a near-equidistant centroid pair differently
# at the last ULP, flipping a cell assignment only on one engine
# (round-6 review finding). list_reduce's first-element init equals
# Spark's 0.0 init exactly (0.0 + x == x for the non-negative squares),
# so the two folds are bit-identical.
_COS = "round(list_cosine_similarity(q.embedding::DOUBLE[], a.embedding::DOUBLE[]), 4)"


def _sq_dist_sql(a: str, b: str) -> str:
    # parenthesize: a cast-then-index `x::DOUBLE[][i]` is a parse error
    return (
        f"list_reduce(list_transform(range(len(({a}))), i -> "
        f"(({a})[i + 1] - ({b})[i + 1]) * (({a})[i + 1] - ({b})[i + 1])), "
        f"(x, y) -> x + y)"
    )


SQD_E = _sq_dist_sql("e.embedding::DOUBLE[]", "c.centroid")
SQD_Q = _sq_dist_sql("q.embedding::DOUBLE[]", "c.centroid")

IVF_ORACLE = f"""
WITH cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         embedding::DOUBLE[] AS centroid
  FROM embeddings
  WHERE vec_id % {STRIDE} = {OFFSET} AND embedding IS NOT NULL
  ORDER BY vec_id LIMIT {N_CELLS}
),
assigned AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {SQD_E}, c.cell
           ) AS rn
    FROM embeddings e CROSS JOIN cents c
    WHERE e.embedding IS NOT NULL
  ) WHERE rn = 1
),
probed AS (
  SELECT query_id, cell FROM (
    SELECT q.vec_id AS query_id, c.cell,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {SQD_Q}, c.cell
           ) AS rn
    FROM embeddings q CROSS JOIN cents c
    WHERE q.vec_id < {N_QUERIES} AND q.embedding IS NOT NULL
  ) WHERE rn <= {N_PROBE}
)
SELECT query_id, neighbor_id, cos_sim FROM (
  SELECT p.query_id, a.vec_id AS neighbor_id, {_COS} AS cos_sim,
         row_number() OVER (
           PARTITION BY p.query_id ORDER BY {_COS} DESC, a.vec_id
         ) AS rn
  FROM probed p
  JOIN assigned a USING (cell)
  JOIN embeddings q ON q.vec_id = p.query_id
  WHERE a.vec_id <> p.query_id
) WHERE rn <= {TOP_K}
"""


@register("ext_ann_ivf_topk", oracle=IVF_ORACLE)
def ext_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k via the real probe path: seeded centroids → broadcast
    argmin assignment → n_probe nearest cells per query → one Arrow
    batch + one Q @ C.T per probed cell → global rank over the
    k × n_probe survivors. digits=4 matches the ANN-family oracles'
    rounded comparison key."""
    from bigdata_spark_realtime_spark.operators.similarity import (
        assign_cells,
        ivf_topk,
        seeded_centroids,
    )

    emb = emb_double(load_table(spark, sf_dir, "embeddings"))
    cents = seeded_centroids(emb, N_CELLS, STRIDE, OFFSET)
    assigned = assign_cells(emb, cents)
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(assigned, cents, queries, k=TOP_K, n_probe=N_PROBE, digits=4)
