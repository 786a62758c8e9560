"""Tail-registration shim: approximation-quality audits, part 2 (r14).

Round 13 added the first two measured-quality audits (ANN recall@k,
MinHash Jaccard calibration — plans/ext_approx_audit.py). This module
completes the family for the remaining two approximate dedup paths,
again composed from the engine's own registered operators so the
audits certify the production plans:

* ``ext_semantic_gap_audit`` — SemDeDup's cross-cluster approximation,
  measured: for a bounded audit sample of the vectors
  ``ext_dedup_semantic`` drops, the cell-restricted redundancy score
  (max cosine over cell-mates) vs the EXACT corpus-wide max cosine,
  and the gap between them. A large gap means the quantizer is
  splitting true neighbors across cells and the EPS pruning is keyed
  on an understated redundancy — exactly the quantity SemDeDup
  (Abbas et al. 2023) assumes is small.
* ``ext_simhash_error_audit`` — per band-blocked SimHash candidate
  pair: the bit-agreement the 64-bit fingerprints imply vs the exact
  cosine of the two documents' token-count vectors, with the
  calibration error against the random-hyperplane expectation
  P[bit agrees] = 1 - θ/π (Charikar 2002, STOC — SimHash §4; same
  audit shape as the MinHash calibration).

Defined at the end of the registry walk (splice rule): the committed
R14 window predates these, and the pre-committed R15 simulation
(plans/ROTATION_R15.md) holds because tail modules register behind
every head-module slot. Both enter PENDING_FIRST_DRIVER_ROW.

Scale (100 TB): the semantic audit broadcasts a BOUNDED sample
(AUDIT_N rows) of the drop set against the corpus stream via the
rerank-shaped ``topk_neighbors_broadcast`` kernel — one corpus pass,
no all-pairs, sample size governs variance, corpus size governs
nothing. The simhash audit's exact side shuffles token counts once
(the tfidf-class exchange) joined only against the |candidates|
band pairs — never all-pairs. Token-count dot products and norms are
INTEGER arithmetic (exact in doubles), so the only float ops are one
division, one sqrt, one acos — rounded to 4 digits on both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.corpus import emb_double
from bigdata_spark_realtime_spark.plans.ext_dedup import (
    SIMHASH_BANDS,
    SIMHASH_ORACLE,
    _BAND_MASK,
    BAND_BITS,
    SIMHASH_BITS,
    ext_dedup_simhash,
    _bucket_pairs,
)
from bigdata_spark_realtime_spark.plans.ext_semantic import (
    SEMANTIC_ORACLE,
    ext_dedup_semantic,
)
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: bounded audit sample of the SemDeDup drop set (lowest vec_ids —
#: deterministic, oracle-replayable). At 100 TB this is the knob that
#: keeps the exact-rerank broadcast bounded; variance of the published
#: gap statistics depends on it, corpus size does not.
AUDIT_N = 25

SEMANTIC_GAP_ORACLE = f"""
WITH drops AS ({SEMANTIC_ORACLE}),
audited AS (SELECT * FROM drops ORDER BY vec_id LIMIT {AUDIT_N}),
exact AS (
  SELECT a.vec_id,
         max(round(list_cosine_similarity(
           ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 4))
           AS exact_max_sim
  FROM audited a
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb
    ON eb.vec_id <> a.vec_id AND eb.embedding IS NOT NULL
  GROUP BY a.vec_id
)
SELECT d.cell, d.vec_id, d.max_sim AS cell_max_sim, e.exact_max_sim,
       round(e.exact_max_sim - d.max_sim, 4) AS gap
FROM audited d JOIN exact e USING (vec_id)
"""


@register("ext_semantic_gap_audit", oracle=SEMANTIC_GAP_ORACLE)
def ext_semantic_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup cross-cluster gap: for AUDIT_N dropped vectors, the
    production cell-restricted max cosine vs the exact corpus-wide max
    cosine (brute rerank via ``topk_neighbors_broadcast`` with k=1 —
    the same kernel the exact ANN baseline runs). gap == 0 means the
    vector's nearest neighbor shares its cell; gap > 0 quantifies the
    redundancy the quantizer hid from the EPS pruning."""
    from bigdata_spark_realtime_spark.operators.vector_ops import (
        topk_neighbors_broadcast,
    )

    # persist the AUDIT_N-row drop set: it feeds TWO actions (the
    # bounded audited-vector fetch below and the final gap join), and
    # without the pin each action re-runs the whole SemDeDup chain —
    # quantizer, assignment kernel, per-cell M @ M.T — from the scan
    drops = (
        ext_dedup_semantic(spark, sf_dir)
        .orderBy("vec_id")
        .limit(AUDIT_N)
        .persist()
    )
    emb = emb_double(load_table(spark, sf_dir, "embeddings"))
    # bounded driver fetch (<= AUDIT_N rows) — the kernel's documented
    # broadcast contract, identical to the brute ANN's query fetch
    audited_pdf = (
        emb.join(drops.select("vec_id"), "vec_id").select("vec_id", "embedding")
    ).toPandas()
    exact = (
        topk_neighbors_broadcast(emb, audited_pdf, k=1)
        .groupBy(F.col("query_id").alias("vec_id"))
        .agg(F.max("cos_sim").alias("exact_max_sim"))
    )
    return drops.join(exact, "vec_id").select(
        "cell",
        "vec_id",
        F.col("max_sim").alias("cell_max_sim"),
        "exact_max_sim",
        F.round(F.col("exact_max_sim") - F.col("max_sim"), 4).alias("gap"),
    )


# exact token-space cosine: tokens are the SAME split the simhash
# fingerprint hashes (space-split, empties included), so the audit
# compares the fingerprint against the vector it actually sketches.
# Counts are integers — dot products and squared norms are exact in
# doubles regardless of summation order, so both engines compute
# bit-identical cosines before the single rounded division.
#
# AUDIT_FANOUT caps the audited pairs per doc_a (smallest doc_b win —
# deterministic): random 16-bit band collisions grow the raw candidate
# list quadratically over the keyspace (measured: 188k pairs at sf0.1,
# 4.08M at a 10x replica — the round-14 scale smoke's one real
# catch), and a calibration audit needs a bounded, unbiased sample,
# not every pair. The cap makes audit work O(fanout x docs) — linear.
AUDIT_FANOUT = 8

SIMHASH_ERR_ORACLE = f"""
WITH sh AS ({SIMHASH_ORACLE}),
bands AS (
  SELECT doc_id, b, (simhash >> (b * {BAND_BITS})) & {_BAND_MASK} AS key
  FROM sh, (SELECT unnest(range({SIMHASH_BANDS})) AS b)
),
rawcand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id
),
cand AS (
  SELECT doc_a, doc_b FROM rawcand
  QUALIFY row_number() OVER (PARTITION BY doc_a ORDER BY doc_b)
          <= {AUDIT_FANOUT}
),
tc AS (
  SELECT doc_id, t.tok, count(*) AS c
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d,
       LATERAL (SELECT unnest(toks) AS tok) t
  GROUP BY doc_id, t.tok
),
norms AS (SELECT doc_id, sum(c * c) AS n2 FROM tc GROUP BY doc_id),
dots AS (
  SELECT c.doc_a, c.doc_b, sum(ta.c * tb.c) AS dot
  FROM cand c
  JOIN tc ta ON ta.doc_id = c.doc_a
  JOIN tc tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
  GROUP BY c.doc_a, c.doc_b
),
scored AS (
  SELECT c.doc_a, c.doc_b,
         CAST(bit_count(xor(s1.simhash, s2.simhash)) AS INT) AS hamming,
         round(1.0 - bit_count(xor(s1.simhash, s2.simhash))::DOUBLE
                     / {SIMHASH_BITS}, 4) AS est_agreement,
         round(coalesce(d.dot, 0)::DOUBLE
               / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)), 4)
           AS exact_cos,
         coalesce(d.dot, 0)::DOUBLE
           / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)) AS raw_cos
  FROM cand c
  JOIN sh s1 ON c.doc_a = s1.doc_id
  JOIN sh s2 ON c.doc_b = s2.doc_id
  JOIN norms na ON na.doc_id = c.doc_a
  JOIN norms nb ON nb.doc_id = c.doc_b
  LEFT JOIN dots d ON d.doc_a = c.doc_a AND d.doc_b = c.doc_b
)
SELECT doc_a, doc_b, hamming, est_agreement, exact_cos,
       round(abs(est_agreement
                 - (1.0 - acos(least(greatest(raw_cos, -1.0), 1.0)) / pi())),
             4) AS abs_err
FROM scored
"""


@register("ext_simhash_error_audit", oracle=SIMHASH_ERR_ORACLE)
def ext_simhash_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash calibration, per band-blocked candidate pair: fingerprint
    bit-agreement (1 - hamming/64) vs the random-hyperplane expectation
    1 - θ/π on the exact token-count cosine. The exact side reuses the
    fingerprints' own tokenizer; the only shuffles are the token-count
    aggregation (tfidf-class) and the |candidates| pair join."""
    from pyspark.sql import Window

    sh = ext_dedup_simhash(spark, sf_dir)
    bands = sh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.shiftright("simhash", b * BAND_BITS)
                        .bitwiseAND(_BAND_MASK)
                        .alias("key"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.b", "bb.key")
    fanout_w = Window.partitionBy("doc_a").orderBy("doc_b")
    cand = (
        _bucket_pairs(bands, ("b", "key"))
        .withColumn("rn", F.row_number().over(fanout_w))
        .where(F.col("rn") <= AUDIT_FANOUT)
        .select("doc_a", "doc_b")
    )

    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    norms = tc.groupBy("doc_id").agg(F.sum(F.col("c") * F.col("c")).alias("n2"))
    ta = tc.select(
        F.col("doc_id").alias("doc_a"), "tok", F.col("c").alias("ca")
    )
    tb = tc.select(
        F.col("doc_id").alias("doc_b"), "tok", F.col("c").alias("cb")
    )
    dots = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "tok"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    s1 = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    s2 = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("nb2"))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    raw_cos = F.coalesce(F.col("dot"), F.lit(0)).cast("double") / (
        F.sqrt(F.col("na2").cast("double")) * F.sqrt(F.col("nb2").cast("double"))
    )
    est = F.round(
        F.lit(1.0) - hamming.cast("double") / SIMHASH_BITS, 4
    )
    pred = F.lit(1.0) - F.acos(
        F.least(F.greatest(raw_cos, F.lit(-1.0)), F.lit(1.0))
    ) / F.lit(math.pi)
    return (
        cand.join(s1, "doc_a")
        .join(s2, "doc_b")
        .join(na, "doc_a")
        .join(nb, "doc_b")
        .join(dots, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            hamming.cast("int").alias("hamming"),
            est.alias("est_agreement"),
            F.round(raw_cos, 4).alias("exact_cos"),
            F.round(F.abs(est - pred), 4).alias("abs_err"),
        )
    )
