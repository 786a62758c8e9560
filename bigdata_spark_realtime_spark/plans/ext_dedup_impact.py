"""Dedup impact report: duplicate-cluster size distribution.

The data-card statistic a curation run publishes AFTER dedup: how many
duplicate clusters exist at each size, how many documents they hold,
and how many rows dedup removes (cluster size − 1 per cluster). Cluster
membership comes from the engine's own resolution operator
(`plans/ext_dedup.ext_dedup_resolve` — MinHash-LSH candidates →
connected components), so this is the audit of that operator's output,
not a new clustering. Lee et al. 2022 report exactly this distribution
(their Table 2) to characterize corpus duplication.

Scale (100 TB): everything after the (already scale-safe) resolution
runs on keeper-cardinality rows — one groupBy keeper for sizes, one
groupBy size for the histogram; output is max-cluster-size rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.ext_dedup import (
    RESOLVE_ORACLE,
    ext_dedup_resolve,
)
from bigdata_spark_realtime_spark.plans.registry import register

DEDUP_IMPACT_ORACLE = f"""
WITH resolved AS (
  {RESOLVE_ORACLE}
),
clusters AS (
  SELECT keeper_id, CAST(count(*) AS BIGINT) AS cluster_size
  FROM resolved GROUP BY keeper_id
)
SELECT cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
       CAST((cluster_size - 1) * count(*) AS BIGINT) AS n_removed
FROM clusters
GROUP BY cluster_size
"""


@register("ext_dedup_impact", oracle=DEDUP_IMPACT_ORACLE)
def ext_dedup_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of duplicate-cluster sizes with per-size document and
    removal counts."""
    resolved = ext_dedup_resolve(spark, sf_dir)
    clusters = resolved.groupBy("keeper_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return clusters.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_docs"),
        ((F.col("cluster_size") - 1) * F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_removed"),
    )
