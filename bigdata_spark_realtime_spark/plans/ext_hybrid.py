"""Hybrid lexical+semantic search via Reciprocal Rank Fusion.

The standard hybrid-retrieval shape (RRF — Cormack et al. 2009; the
fusion Elasticsearch/OpenSearch ship for BM25+kNN): run a lexical
ranking (BM25, plans/ext_bm25.py) and a semantic ranking (cosine to a
per-query anchor embedding — query-by-example) independently, then fuse
by rank, not by score:

    rrf(d) = Σ_rankings SCALE DIV (K_RRF + rank(d))

Fusing RANKS sidesteps the classic incompatibility of BM25's unbounded
scores with bounded cosines — and makes the whole operator integer-
exact for the oracle (ranks are integers; SCALE DIV (60+r) is exact in
both engines). The semantic ranks come from 4-decimal-rounded cosines
(the deterministic left-to-right fold shared with the SRP/embedding
dedup oracles, plans/corpus.py) with doc_id tie-breaks, so both
engines derive identical rank tables.

Scale (100 TB):
- the lexical side reuses bm25_agg: query terms broadcast, only
  term-matching docs scored;
- the semantic side IS the IVF machinery (operators/similarity.ivf_topk
  over the same seeded quantizer as ext_ann_ivf_topk): anchors probe
  their nearest cells and only those cells' vectors are scored — at
  corpus scale set ``N_PROBE_HYBRID`` < n_cells and the candidate scan
  is |corpus| × n_probe / n_cells. At test scale it probes ALL cells,
  which makes the probe path exhaustive — bit-identical to the exact
  brute-force ranking — so the DuckDB oracle stays the exact scan and
  the driver hash still gates the full IVF path (centroids, assignment,
  per-cell Arrow scoring, global rank). RRF only ever consumes top-k
  lists, so narrowing n_probe changes recall, not the fusion;
- fusion touches 2 × top-K rows per query: driver-free, broadcast-size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_spark_realtime_spark.plans.ext_bm25 import BM25_AGG_SQL, bm25_agg
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: per-query anchor documents (query-by-example vectors); ids < 500 so
#: every SF's embeddings table contains them
ANCHORS: dict[str, int] = {
    "q_spark_window": 3,
    "q_customer_order": 17,
    "q_fast_hash": 42,
    "q_slow_scan": 99,
}
#: candidate depth per ranking and fused output size
CAND_K = 20
HYBRID_TOP_K = 10
#: RRF constants (K_RRF = 60 is the literature default)
K_RRF = 60
SCALE = 1_000_000

_ANCHOR_SQL = " UNION ALL ".join(
    f"SELECT '{qid}' AS query_id, {d} AS anchor_id" for qid, d in ANCHORS.items()
)

HYBRID_ORACLE = f"""
WITH {BM25_AGG_SQL},
lex AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY bm25_score DESC, doc_id
         ) AS lex_rnk
  FROM agg
),
anchors AS ({_ANCHOR_SQL}),
-- NULL vectors sit out every vector op (engine: emb_double). The
-- filter lives in a MATERIALIZED source CTE because DuckDB's
-- optimizer can hoist the cosine projection above a plain WHERE in
-- the full fused pipeline, crashing list_cosine_similarity on the
-- NULL it was told to drop (nulls-injected boundary sweep)
embn AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL
),
sem_all AS (
  SELECT a.query_id, e.vec_id AS doc_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[],
                                      q.embedding::DOUBLE[]), 4) AS cos_sim
  FROM anchors a
  JOIN embn q ON a.anchor_id = q.vec_id
  CROSS JOIN embn e
),
sem AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cos_sim DESC, doc_id
         ) AS sem_rnk
  FROM sem_all
),
fused AS (
  SELECT COALESCE(l.query_id, s.query_id) AS query_id,
         COALESCE(l.doc_id, s.doc_id) AS doc_id,
         COALESCE({SCALE} // ({K_RRF} + l.lex_rnk), 0)
           + COALESCE({SCALE} // ({K_RRF} + s.sem_rnk), 0) AS rrf_score
  FROM (SELECT * FROM lex WHERE lex_rnk <= {CAND_K}) l
  FULL OUTER JOIN (SELECT * FROM sem WHERE sem_rnk <= {CAND_K}) s
    ON l.query_id = s.query_id AND l.doc_id = s.doc_id
)
SELECT query_id, doc_id, CAST(rrf_score AS BIGINT) AS rrf_score,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY rrf_score DESC, doc_id
       ) AS INT) AS rnk
FROM fused
QUALIFY rnk <= {HYBRID_TOP_K}
"""


#: semantic-leg probe width. At test scale probe EVERY cell: the IVF
#: candidate set is then the whole corpus and the probe-path ranking is
#: bit-identical to the exact scan the oracle runs. At 100 TB set this
#: below ext_ivf.N_CELLS (e.g. 4) for the |corpus|·n_probe/n_cells scan.
N_PROBE_HYBRID = 16

#: anchors are corpus members and the current contract KEEPS the anchor
#: doc in its own result list (cos 1.0, sem rank 1). ivf_topk's kernel
#: excludes candidates whose vec_id equals the query_id, so anchor
#: queries travel under vec_id + _QID_OFFSET (no corpus id collides)
#: and are mapped back to their string query_id after the probe.
_QID_OFFSET = 1 << 40


@register("ext_hybrid_search", oracle=HYBRID_ORACLE)
def ext_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 per query by Reciprocal Rank Fusion of the BM25 lexical
    top-20 and the anchor-embedding cosine top-20, the semantic leg
    served by the real IVF probe path (exhaustive-probe at test scale;
    see N_PROBE_HYBRID)."""
    from bigdata_spark_realtime_spark.operators.similarity import (
        assign_cells,
        ivf_topk,
        seeded_centroids,
    )
    from bigdata_spark_realtime_spark.plans.ext_dedup import emb_double
    from bigdata_spark_realtime_spark.plans.ext_ivf import (
        N_CELLS,
        OFFSET,
        STRIDE,
    )

    lex_w = Window.partitionBy("query_id").orderBy(
        F.desc("bm25_score"), "doc_id"
    )
    lex = (
        bm25_agg(spark, sf_dir)
        .withColumn("lex_rnk", F.row_number().over(lex_w))
        .where(F.col("lex_rnk") <= CAND_K)
        .select("query_id", "doc_id", "lex_rnk")
    )

    emb = emb_double(load_table(spark, sf_dir, "embeddings"))
    anchors = spark.createDataFrame(
        list(ANCHORS.items()), "query_id string, anchor_id long"
    )
    # the same seeded coarse quantizer ext_ann_ivf_topk gates
    cents = seeded_centroids(emb, N_CELLS, STRIDE, OFFSET)
    assigned = assign_cells(emb, cents)
    q_vecs = (
        F.broadcast(anchors)
        .join(emb, anchors["anchor_id"] == emb["vec_id"])
        .select(
            (F.col("anchor_id") + F.lit(_QID_OFFSET)).alias("query_id"),
            "embedding",
        )
    )
    topk = ivf_topk(
        assigned, cents, q_vecs, k=CAND_K, n_probe=N_PROBE_HYBRID, digits=4
    )
    sem_w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "doc_id")
    sem = (
        topk.select(
            (F.col("query_id") - F.lit(_QID_OFFSET)).alias("anchor_id"),
            F.col("neighbor_id").alias("doc_id"),
            "cos_sim",
        )
        .join(F.broadcast(anchors), "anchor_id")
        .withColumn("sem_rnk", F.row_number().over(sem_w))
        .where(F.col("sem_rnk") <= CAND_K)
        .select("query_id", "doc_id", "sem_rnk")
    )

    fused = (
        lex.join(sem, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            (
                F.coalesce(
                    F.expr(f"{SCALE} DIV ({K_RRF} + lex_rnk)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"{SCALE} DIV ({K_RRF} + sem_rnk)"), F.lit(0)
                )
            ).alias("rrf_score"),
        )
    )
    out_w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), "doc_id")
    return (
        fused.withColumn("rnk", F.row_number().over(out_w))
        .where(F.col("rnk") <= HYBRID_TOP_K)
        .select(
            "query_id",
            "doc_id",
            "rrf_score",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
