"""Volume anomaly detection over the daily rollup.

The monitoring query a pipeline runs ON its continuous aggregates
(`plans/ext_rollup.py`): flag days whose event volume deviates from
the per-type baseline — traffic drops (a broken producer) and spikes
(a bot flood or replay) are the two failure modes every ingest
dashboard alerts on.

Exactness: no float z-scores — the baseline is the RANK median of the
type's daily counts (lower median, deterministic (ct, day) tie-break,
the same integer-median trick as `plans/ext_profile.py`) and the
deviation is integer ppm ``1e6·ct DIV median``. Anomaly =
deviation ≥ 2× or ≤ 0.5× — integer threshold compares, bit-identical
cross-engine.

Scale (100 TB): runs entirely on rollup-cardinality rows (days ×
types) after one raw count shuffle — in production the input is the
persisted hourly/daily continuous aggregate, so raw is never
rescanned; the median window partitions by type over day-count rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: anomaly thresholds in ppm of the median (2x above, 0.5x below)
ANOM_HI_PPM = 2_000_000
ANOM_LO_PPM = 500_000

ANOMALY_ORACLE = f"""
WITH daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         event_type, CAST(count(*) AS BIGINT) AS ct
  FROM events GROUP BY 1, 2
),
med AS (
  SELECT event_type, ct AS median_ct FROM (
    SELECT event_type, ct,
           row_number() OVER (
             PARTITION BY event_type ORDER BY ct, day
           ) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM daily
  ) WHERE rn = (n + 1) // 2
)
SELECT d.day, d.event_type, d.ct, m.median_ct,
       CAST(1000000 * d.ct // m.median_ct AS BIGINT) AS dev_ppm,
       CAST(CASE WHEN 1000000 * d.ct // m.median_ct >= {ANOM_HI_PPM}
                   OR 1000000 * d.ct // m.median_ct <= {ANOM_LO_PPM}
                 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM daily d JOIN med m USING (event_type)
"""


@register("ext_rollup_anomaly", oracle=ANOMALY_ORACLE)
def ext_rollup_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type volume vs the type's rank-median baseline, with
    integer-ppm deviation and a 2x/0.5x anomaly flag."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    w_rn = Window.partitionBy("event_type").orderBy("ct", "day")
    w_n = Window.partitionBy("event_type")
    med = (
        daily.withColumn("rn", F.row_number().over(w_rn))
        .withColumn("n", F.count(F.lit(1)).over(w_n))
        .where(F.col("rn") == F.expr("(n + 1) DIV 2"))
        .select("event_type", F.col("ct").alias("median_ct"))
    )
    dev = F.expr("1000000 * ct DIV median_ct")
    return (
        daily.join(med, "event_type")
        .select(
            "day",
            "event_type",
            "ct",
            "median_ct",
            dev.cast("bigint").alias("dev_ppm"),
            F.when(
                (dev >= ANOM_HI_PPM) | (dev <= ANOM_LO_PPM), F.lit(1)
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("is_anomaly"),
        )
    )
