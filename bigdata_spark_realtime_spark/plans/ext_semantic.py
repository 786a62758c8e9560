"""Extension operator: SemDeDup — semantic deduplication over embeddings.

SemDeDup (Abbas et al. 2023, arXiv:2303.09540) prunes a corpus by
clustering its embeddings with a coarse quantizer and, within each
cluster, removing the most mutually-similar fraction: for every vector
compute its max cosine similarity to its cluster-mates, then drop the
top ``EPS`` fraction per cluster by that redundancy score. Unlike the
threshold-based near-dup family (plans/ext_dedup.py) this prunes a
FIXED fraction regardless of the similarity distribution — the shape
used to thin web-scale corpora where "semantically redundant" is
relative, not absolute.

Spark plan: seeded deterministic centroids (the oracle-replayable
stand-in for trained KMeans — same machinery as plans/ext_ivf.py, same
constants, so the two queries share the assignment stage's semantics)
→ broadcast argmin cell assignment → ONE groupBy(cell) exchange into a
per-cell Arrow kernel (operators/vector_ops.semantic_dedup_drops):
normalize once, one M @ M.T, per-row max over the off-diagonal, rank,
emit only the dropped rows. Similarities are rounded to 4 digits
BEFORE the max/rank (ties broken by vec_id) so DuckDB replays the
identical drop set.

At 100 TB: the quantizer is trained KMeans (operators/similarity
.build_ivf_index) with nlist ≈ √n — the FAISS sizing that balances
assignment (n·cells FLOPs) against the per-cell M @ M.T (n²/cells) at
n^1.5 each; cells that still outgrow an Arrow batch are pre-split by
operators/similarity.split_oversized_cells (bounded per-task memory at
the cost of cross-sub-cell pairs — SemDeDup's own cross-cluster
approximation). Assignment itself is map-side since round 15: the
centroid matrix rides inside an Arrow kernel closure and every batch
argmins in C (operators/similarity.assign_cells documents the
bit-exact fold-order contract), so the corpus's ONLY exchange is the
groupBy(cell). No all-pairs stage exists anywhere.

Reference parity: the reference has no embedding surface; this extends
the engine for training-data curation (SURVEY.md §2 ext), composing
with the quality/dedup/sampling pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.corpus import emb_double
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: fraction of each cell pruned — the paper sweeps 1-50%; 10% keeps the
#: gate's drop set non-trivial at every test SF
EPS = 0.1
#: quantizer constants shared with plans/ext_ivf.py so both queries
#: exercise the same assignment semantics
N_CELLS = 16
STRIDE = 31
OFFSET = 7

# The oracle replays every stage: same centroid slice, same
# argmin-by-(distance, cell) assignment as plans/ext_ivf.IVF_ORACLE,
# then max-of-rounded-cosine per vector and the per-cell top-ceil(eps*n)
# drop rank. count(*) OVER (PARTITION BY cell) equals the cell size
# because every member of a cell with >= 2 vectors appears in `sims`
# (it has at least one cell-mate) and size-1 cells produce no rows.
# assignment distance = the Spark-side squared-L2 fold, bit-identical
# (see plans/ext_ivf.py: list_distance's sqrt'd own-order accumulation
# can flip a near-equidistant assignment at the last ULP)
from bigdata_spark_realtime_spark.plans.ext_ivf import SQD_E  # noqa: E402

SEMANTIC_ORACLE = f"""
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
sims AS (
  SELECT a.cell, a.vec_id,
         max(round(list_cosine_similarity(
           a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4)) AS max_sim
  FROM assigned a
  JOIN assigned b ON a.cell = b.cell AND a.vec_id <> b.vec_id
  GROUP BY a.cell, a.vec_id
),
ranked AS (
  SELECT cell, vec_id, max_sim,
         row_number() OVER (
           PARTITION BY cell ORDER BY max_sim DESC, vec_id) AS rn,
         count(*) OVER (PARTITION BY cell) AS n
  FROM sims
)
SELECT CAST(cell AS BIGINT) AS cell, vec_id, max_sim
FROM ranked WHERE rn <= ceil({EPS} * n)
"""


@register("ext_dedup_semantic", oracle=SEMANTIC_ORACLE)
def ext_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup drop set: (cell, vec_id, max_sim) for the EPS most
    semantically redundant vectors of each quantizer cell."""
    from bigdata_spark_realtime_spark.operators.similarity import (
        assign_cells,
        seeded_centroids,
    )
    from bigdata_spark_realtime_spark.operators.vector_ops import (
        semantic_dedup_drops,
    )

    emb = emb_double(load_table(spark, sf_dir, "embeddings"))
    cents = seeded_centroids(emb, N_CELLS, STRIDE, OFFSET)
    assigned = assign_cells(emb, cents)
    return semantic_dedup_drops(assigned, EPS, block_col="cell", digits=4)
