"""Join-key skew audit — the diagnostic you run BEFORE a 100 TB join.

Every skew mitigation in this engine (AQE skew split, salting, the
LSH bucket caps, the co-occurrence quota) presumes you know WHICH keys
are hot. This operator is that knowledge as a query: per join key
(`events.user_id` here — the key every user-dimension join and the
co-occurrence expansion shuffle on), the heaviest keys with their
corpus share in ppm, plus the aggregate concentration the planner
cares about (share of the single hottest key ≈ the biggest single
shuffle partition a non-split join would build).

Exactness: shares are ``1e6 · cnt DIV total`` — integer ppm,
truncating division identical cross-engine.

Scale (100 TB): one count shuffle with map-side partials on the
audited key (the cheapest possible statistic on it); top-K is
TakeOrderedAndProject over key-cardinality rows. Production samples
(`TABLESAMPLE`) first when even one count pass is too much — the plan
shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: heaviest keys reported
SKEW_TOP_K = 20

SKEW_AUDIT_ORACLE = f"""
WITH kc AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id
),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM kc)
SELECT kc.user_id, kc.cnt,
       CAST(1000000 * kc.cnt // tot.total AS BIGINT) AS share_ppm
FROM kc CROSS JOIN tot
ORDER BY kc.cnt DESC, kc.user_id
LIMIT {SKEW_TOP_K}
"""


@register("ext_skew_audit", oracle=SKEW_AUDIT_ORACLE)
def ext_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K heaviest join keys on events.user_id with integer-ppm
    corpus shares."""
    ev = load_table(spark, sf_dir, "events")
    kc = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    tot = kc.agg(F.sum("cnt").cast("bigint").alias("total"))
    return (
        kc.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "cnt",
            F.expr("CAST(1000000 * cnt DIV total AS BIGINT)").alias(
                "share_ppm"
            ),
        )
        .orderBy(F.col("cnt").desc(), "user_id")
        .limit(SKEW_TOP_K)
    )
