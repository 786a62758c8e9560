"""Time-to-convert: first-view → first-purchase latency percentiles.

The funnel family answers "how many convert"
(`plans/ext_funnel.ext_funnel_steps`, `ext_funnel_conversion`); the
product question that follows is "how LONG does conversion take".
Per user: the first view timestamp and the first purchase timestamp
STRICTLY after it (conditional mins — the funnel's staged-aggregation
shape, no self-join); per first-view-day cohort: converter count and
the exact rank-based lower median and maximum of the latency.

Exactness: latencies are epoch-ms differences (int64); the median is
a rank pick — row (n+1) DIV 2 in (latency, user_id) order — the same
deterministic integer-median discipline as `ext_rollup_anomaly`, no
float percentile interpolation anywhere.

Scale (100 TB): one user-keyed reduction (two conditional mins), one
cohort-keyed rank window over converter-cardinality rows (users, not
events), partitioned by cohort day. Two shuffles total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

TIME_TO_CONVERT_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS tv,
         min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS tp
  FROM events GROUP BY user_id
),
conv AS (
  SELECT user_id,
         strftime(make_timestamp(tv * 1000), '%Y-%m-%d') AS cohort_day,
         tp - tv AS latency_ms
  FROM per_user
  WHERE tv IS NOT NULL AND tp IS NOT NULL AND tp > tv
),
ranked AS (
  SELECT cohort_day, latency_ms,
         row_number() OVER (PARTITION BY cohort_day
                            ORDER BY latency_ms, user_id) AS rn,
         count(*) OVER (PARTITION BY cohort_day) AS n
  FROM conv
)
SELECT cohort_day,
       CAST(n AS BIGINT) AS n_converted,
       CAST(latency_ms AS BIGINT) AS median_latency_ms,
       CAST(max(latency_ms) OVER (PARTITION BY cohort_day) AS BIGINT)
         AS max_latency_ms
FROM ranked
QUALIFY rn = (n + 1) // 2
"""


@register("ext_time_to_convert", oracle=TIME_TO_CONVERT_ORACLE)
def ext_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per first-view-day cohort: converter count, exact rank-median
    and max of the first-view→first-purchase latency (strictly-after
    contract, conditional-min funnel shape)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.unix_millis("ts"))
        ).alias("tv"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_millis("ts"))
        ).alias("tp"),
    )
    conv = per_user.where(
        F.col("tv").isNotNull() & F.col("tp").isNotNull() & (F.col("tp") > F.col("tv"))
    ).select(
        "user_id",
        F.date_format(F.timestamp_millis("tv"), "yyyy-MM-dd").alias("cohort_day"),
        (F.col("tp") - F.col("tv")).alias("latency_ms"),
    )
    wrank = Window.partitionBy("cohort_day").orderBy("latency_ms", "user_id")
    wall = Window.partitionBy("cohort_day")
    ranked = conv.select(
        "cohort_day",
        "latency_ms",
        F.row_number().over(wrank).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.max("latency_ms").over(wall).alias("mx"),
    )
    return ranked.where(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "cohort_day",
        F.col("n").cast("bigint").alias("n_converted"),
        F.col("latency_ms").cast("bigint").alias("median_latency_ms"),
        F.col("mx").cast("bigint").alias("max_latency_ms"),
    )
