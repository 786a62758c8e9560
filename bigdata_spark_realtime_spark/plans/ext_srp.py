"""Embedding near-dup via sign-random-projection (SRP) LSH.

`ext_dedup_embedding` (plans/ext_dedup.py) blocks by the `label` column
— a stand-in for an IVF cell id that assumes a quantizer already
exists. This operator is the *self-contained* scale path: bucket
vectors by the signs of random-hyperplane projections (no training
step), generate candidate pairs bucket-locally, verify with exact
cosine. The reference has no vector operators at all (its closest
analogue is the Redis set-membership dedup, `app/dwd_DauApp.scala:
96-116`); this extends the engine for training-data pipelines.

Scale design (100 TB):
- signatures are one `mapInPandas` pass — per Arrow batch a single
  int64 matrix product Q @ W.T (192 hyperplanes), no shuffle;
- candidates come from the same skew-guarded bucket-local pair
  generation as the MinHash/SimHash paths (`operators/shingling.bucket_pairs`):
  the only shuffle key is the (band, key) bucket, never all-pairs,
  and degenerate buckets fall back to a distributed join;
- the verify join touches |candidates| pairs only (≈0.02% of pairs for
  orthogonal vectors at 12×16-bit banding, ≈91% recall at cosine 0.95
  and ≈99% at 0.98); 16-bit bands give 65 536 bucket keys per band —
  the same no-corpus-scale-bucket-ceiling argument as the SimHash
  path, vs. the 64-key ceiling a 6-bit band would impose.

Bucket membership is *bit-identical* across engines because the
projection is integer end-to-end (see functions/hashing.py SRP notes):
a float dot near zero may flip sign between numpy's pairwise sums and
a SQL fold, so floats would make Spark and DuckDB disagree on buckets.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.functions import hashing as H
from bigdata_spark_realtime_spark.operators.shingling import bucket_pairs as _bucket_pairs
from bigdata_spark_realtime_spark.plans.corpus import cosine, emb_double
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

SRP_TOPK = 20

# ---------------------------------------------------------------------------
# oracle: the same integer projection in DuckDB SQL (weights are
# interpolated literals, so both engines share the exact hyperplanes)
# ---------------------------------------------------------------------------


def _plane_dot_sql(p: int) -> str:
    # explicit 64-term sum, not list_transform over a literal list:
    # DuckDB re-materializes a list literal per element access, turning
    # each dot into O(dim²) — measured 4× the whole oracle's runtime
    return "(" + " + ".join(
        f"qe[{d + 1}]*({w})" for d, w in enumerate(H.SRP_W[p])
    ) + ")"


def _band_key_sql(b: int) -> str:
    terms = [
        f"(CASE WHEN {_plane_dot_sql(b * H.SRP_ROWS + r)} >= 0 "
        f"THEN {1 << (H.SRP_ROWS - 1 - r)} ELSE 0 END)"
        for r in range(H.SRP_ROWS)
    ]
    return " + ".join(terms)


_BANDS_UNION = "\n  UNION ALL\n  ".join(
    f"SELECT vec_id, {b} AS band, k{b} AS key FROM sig"
    for b in range(H.SRP_BANDS)
)

SRP_ORACLE = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * {H.SRP_SCALE}) AS BIGINT)) AS qe
  FROM embeddings WHERE embedding IS NOT NULL
),
sig AS MATERIALIZED (
  SELECT vec_id,
         {', '.join(f'{_band_key_sql(b)} AS k{b}' for b in range(H.SRP_BANDS))}
  FROM q
),
bands AS (
  {_BANDS_UNION}
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
       round(list_cosine_similarity(e1.embedding::DOUBLE[],
                                    e2.embedding::DOUBLE[]), 4) AS cos_sim
FROM cand c
JOIN embeddings e1 ON c.vec_a = e1.vec_id
JOIN embeddings e2 ON c.vec_b = e2.vec_id
ORDER BY cos_sim DESC, vec_a, vec_b
LIMIT {SRP_TOPK}
"""


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------


def srp_band_rows(emb: DataFrame) -> DataFrame:
    """(vec_id, band, key) — one row per vector per band.

    One `mapInPandas` pass: floor-quantize the batch to int64, one
    Q @ W.T integer matrix product for all 24 planes, pack each band's
    6 sign bits into its key. No shuffle; the Arrow batch is the unit
    of vectorization (same sanctioned-BLAS rationale as vector_ops)."""
    import numpy as np

    w_t = np.array(H.SRP_W, dtype=np.int64)  # (planes, dim)
    schema = "vec_id long, band int, key long"

    def sig(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            qe = np.floor(m * H.SRP_SCALE).astype("int64")
            bits = (qe @ w_t.T >= 0).astype("int64")  # (n, planes)
            n = len(pdf)
            keys = np.zeros((n, H.SRP_BANDS), dtype="int64")
            for b in range(H.SRP_BANDS):
                for r in range(H.SRP_ROWS):
                    keys[:, b] = keys[:, b] * 2 + bits[:, b * H.SRP_ROWS + r]
            ids = pdf["vec_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, H.SRP_BANDS),
                    "band": np.tile(
                        np.arange(H.SRP_BANDS, dtype="int32"), n
                    ),
                    "key": keys.reshape(-1),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(sig, schema)


@register("ext_dedup_embedding_srp", oracle=SRP_ORACLE)
def ext_dedup_embedding_srp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K most-similar candidate pairs from SRP-LSH buckets: quantized
    sign-random-projection signatures (12 bands × 16 bits) → skew-guarded
    bucket-local pairs → exact-cosine verify on candidates only →
    global top-K by (rounded cos_sim DESC, vec_a, vec_b)."""
    # emb_double drops NULL vectors before the signature kernel (its
    # np.stack crashes on None; the kernel astype('float64')s anyway,
    # so the double cast never changes a signature)
    e = emb_double(load_table(spark, sf_dir, "embeddings"))
    cand = _bucket_pairs(
        srp_band_rows(e).withColumnRenamed("vec_id", "doc_id"),
        ("band", "key"),
    ).select(F.col("doc_a").alias("vec_a"), F.col("doc_b").alias("vec_b"))
    e1 = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    e2 = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    cos = F.round(cosine(F.col("emb_a"), F.col("emb_b")), 4)
    return (
        cand.join(e1, "vec_a")
        .join(e2, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_a", "vec_b")
        .limit(SRP_TOPK)
    )
