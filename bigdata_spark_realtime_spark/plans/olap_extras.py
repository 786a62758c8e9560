"""OLAP breadth: rollup hierarchies and approximate aggregates.

Rollup/cube don't exist in the reference (SURVEY.md §2.7: "no grouping
sets / rollup / cube") — engine-native extras. Approximate aggregates
(HLL distinct, quantile sketches) are the standard scale substitutes for
exact distinct counts; their sketches differ per engine, so the gate
entry is rows-only and the accuracy bound is asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.hints import broadcast_bounded
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

ROLLUP_ORACLE = """
SELECT r.r_name AS region, n.n_name AS nation,
       round(sum(c.c_acctbal), 2) AS balance,
       count(*) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (region, nation)
"""


@register("rollup_region_nation", oracle=ROLLUP_ORACLE)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region→nation rollup: subtotals + grand total in one aggregation
    pass (grouping-sets expansion, still partial+final hash agg)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(broadcast_bounded(n), c.c_nationkey == n.n_nationkey).join(
        broadcast_bounded(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup(
        F.col("r_name").alias("region"), F.col("n_name").alias("nation")
    ).agg(
        F.round(F.sum("c_acctbal"), 2).alias("balance"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@register("approx_aggregates")
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct + quantile sketch per event_type. Rows-only in the
    gate (sketch algorithms are engine-specific by nature); the ≤5%
    error bound vs exact is asserted in tests/test_olap_extras.py."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", 0.5, 10000).alias("approx_median_value"),
    )
