"""Embedding-table quality audit: per-dimension stats and norm census.

Before any ANN index, dedup pass, or centroid fit touches a 100 TB
embedding table, the pipeline needs to know the table is SANE: dead
dimensions (all-zero), clipped dimensions (suspicious min/max), and
degenerate vectors (near-zero norm) silently poison cosine similarity.
Two audits:

- **`ext_embedding_dim_stats`**: per dimension — count, fixed-point
  sum / min / max, and the zero count. 64 output rows regardless of
  table size.
- **`ext_embedding_norm_census`**: per vector, the exact integer
  squared norm Σ vq² (fixed-point), bucketed into power-of-two octaves
  (the `ext_quantile_sketch` key shape) — a resolution-bounded norm
  histogram whose row count is log-bounded, not data-bounded.

Exactness: v_q = floor(double(v) · 2²⁰) — float→double widening and
one IEEE multiply on identical operands are bit-exact across engines
(the `plans/ext_embed.py` discipline); everything after is int64.
Scale: one explode + map-side-combined groupBy each; no joins, no
windows over data-sized frames. Squared-norm bound: |v| ≤ 2 keeps
Σ₆₄ vq² < 2⁶³ by six orders of magnitude.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.ext_embed import FIXED_POINT
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

_DIMS_CTE = f"""
dims AS (
  SELECT u.i AS dim,
         CAST(floor(CAST(embedding[u.i + 1] AS DOUBLE)
                    * {float(FIXED_POINT)}) AS BIGINT) AS vq
  FROM embeddings, unnest(range(len(embedding))) AS u(i)
  WHERE embedding IS NOT NULL
)
"""

DIM_STATS_ORACLE = f"""
WITH {_DIMS_CTE}
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(vq) AS BIGINT) AS sum_q,
       CAST(min(vq) AS BIGINT) AS min_q,
       CAST(max(vq) AS BIGINT) AS max_q,
       CAST(sum(CASE WHEN vq = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
FROM dims GROUP BY dim
"""


def _dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    return emb.select(
        F.posexplode(
            F.transform(
                "embedding",
                lambda v: F.floor(v.cast("double") * float(FIXED_POINT)).cast(
                    "bigint"
                ),
            )
        ).alias("dim", "vq")
    )


@register("ext_embedding_dim_stats", oracle=DIM_STATS_ORACLE)
def ext_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension fixed-point count/sum/min/max/zero-count — the
    dead-and-clipped-dimension audit; one explode + one 64-key
    map-side-combined groupBy."""
    return (
        _dims(spark, sf_dir)
        .groupBy(F.col("dim").cast("bigint").alias("dim"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.sum("vq").cast("bigint").alias("sum_q"),
            F.min("vq").cast("bigint").alias("min_q"),
            F.max("vq").cast("bigint").alias("max_q"),
            F.sum(F.when(F.col("vq") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_zero"),
        )
    )


NORM_CENSUS_ORACLE = f"""
WITH {_DIMS_CTE.replace("u.i AS dim", "vec_id, u.i AS dim")},
norms AS (
  SELECT vec_id, CAST(sum(vq * vq) AS BIGINT) AS norm_sq
  FROM dims GROUP BY vec_id
),
keyed AS (
  SELECT CASE WHEN norm_sq = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(length(bin(norm_sq)) AS BIGINT) END AS octave,
         norm_sq
  FROM norms
)
SELECT octave,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(min(norm_sq) AS BIGINT) AS norm_min,
       CAST(max(norm_sq) AS BIGINT) AS norm_max
FROM keyed GROUP BY octave
"""


@register("ext_embedding_norm_census", oracle=NORM_CENSUS_ORACLE)
def ext_embedding_norm_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer squared-norm per vector folded into power-of-two
    octave buckets (bit-length of the int64 norm — no float log) — the
    degenerate-vector histogram, log-bounded output."""
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    norms = emb.select(
        F.aggregate(
            F.transform(
                "embedding",
                lambda v: F.floor(v.cast("double") * float(FIXED_POINT)).cast(
                    "bigint"
                ),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, vq: acc + vq * vq,
        ).alias("norm_sq")
    )
    keyed = norms.select(
        F.when(F.col("norm_sq") == 0, F.lit(0).cast("bigint"))
        .otherwise(F.length(F.bin("norm_sq")).cast("bigint"))
        .alias("octave"),
        "norm_sq",
    )
    return keyed.groupBy("octave").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.min("norm_sq").cast("bigint").alias("norm_min"),
        F.max("norm_sq").cast("bigint").alias("norm_max"),
    )
