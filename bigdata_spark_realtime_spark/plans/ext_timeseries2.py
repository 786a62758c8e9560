"""Seasonality baseline and CUSUM change-point over hourly partials.

Companions to `plans/ext_timeseries.py`, consuming the same hourly
reduction of the event feed:

- **Hour-of-day seasonal deviation** (`ext_seasonal_baseline`): the
  ops-dashboard staple — compare each hour's average value against the
  long-run average for that hour-of-day, so "3 AM looks dead" stops
  being an anomaly. Deviation is integer ppm; per-hour and per-bucket
  averages are truncating DIVs on data-scale-independent magnitudes
  (average cents per event is bounded by the value domain, not the
  row count), so every number is bit-identical across engines.
- **CUSUM change-point** (`ext_changepoint_cusum`, Page 1954): the
  level-shift detector — S_h = Σ_{h'≤h} (H·c_h' − T) is the
  zero-mean cumulative deviation of hourly counts from the per-type
  mean (multiplied through by H = #hours so no division ever happens);
  the |S| peak marks the most likely shift point. argmax tie-breaks
  on earliest hour, pinned in both engines.

Scale (100 TB): both reduce raw events ONCE with a map-side-combined
groupBy to calendar-bounded hourly partials; every window below that
partitions by event_type over ≤ #hours rows. The seasonal join back
is a broadcast of the 24-row-per-type baseline. Overflow: H ≤ 10⁵
calendar hours and T ≤ 10¹³ rows keep H·cum < 2⁶³ with headroom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.ext_timeseries import _HOURLY_CTE, _hourly
from bigdata_spark_realtime_spark.plans.registry import register

#: parts-per-million scale for seasonal deviation
PPM = 1_000_000

SEASONAL_ORACLE = f"""
WITH {_HOURLY_CTE},
obs AS (
  SELECT event_type, h,
         CAST(hour(h) AS BIGINT) AS hod,
         v100 // cnt AS avg_h,
         cnt, v100
  FROM hourly
),
base AS (
  SELECT event_type, hod,
         CAST(sum(v100) AS BIGINT) // CAST(sum(cnt) AS BIGINT) AS avg_hod
  FROM obs GROUP BY event_type, hod
)
SELECT o.event_type,
       strftime(o.h, '%Y-%m-%d %H') AS hr,
       o.hod,
       o.avg_h,
       b.avg_hod,
       CASE WHEN b.avg_hod = 0 THEN CAST(0 AS BIGINT)
            ELSE ({PPM} * o.avg_h) // b.avg_hod - {PPM} END AS dev_ppm
FROM obs o JOIN base b
  ON o.event_type = b.event_type AND o.hod = b.hod
"""


@register("ext_seasonal_baseline", oracle=SEASONAL_ORACLE)
def ext_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each hour's average cents-per-event against the hour-of-day
    baseline for its event type, deviation in integer ppm — one raw
    reduction, one tiny re-aggregation, one broadcast join back."""
    from bigdata_spark_realtime_spark.plans.corpus import scoped_persist

    hourly = scoped_persist(_hourly(spark, sf_dir), "ts_seasonal", keep=1)
    obs = hourly.select(
        "event_type",
        "h",
        F.hour("h").cast("bigint").alias("hod"),
        F.expr("v100 div cnt").alias("avg_h"),
        "cnt",
        "v100",
    )
    base = obs.groupBy("event_type", "hod").agg(
        F.expr(
            "CAST(sum(v100) AS BIGINT) div CAST(sum(cnt) AS BIGINT)"
        ).alias("avg_hod")
    )
    return obs.join(F.broadcast(base), ["event_type", "hod"]).select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH").alias("hr"),
        "hod",
        "avg_h",
        "avg_hod",
        F.expr(
            f"CASE WHEN avg_hod = 0 THEN CAST(0 AS BIGINT) "
            f"ELSE ({PPM} * avg_h) div avg_hod - {PPM} END"
        ).alias("dev_ppm"),
    )


CUSUM_ORACLE = f"""
WITH {_HOURLY_CTE},
tot AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_hours,
         CAST(sum(cnt) AS BIGINT) AS total
  FROM hourly GROUP BY event_type
),
cum AS (
  SELECT h.event_type, h.h,
         t.n_hours,
         t.n_hours * sum(h.cnt) OVER (
           PARTITION BY h.event_type ORDER BY h.h
           ROWS UNBOUNDED PRECEDING)
         - (row_number() OVER (PARTITION BY h.event_type ORDER BY h.h)
            * t.total) AS s
  FROM hourly h JOIN tot t ON t.event_type = h.event_type
)
SELECT event_type,
       strftime(h, '%Y-%m-%d %H') AS cp_hour,
       CAST(s AS BIGINT) AS s_peak,
       CAST(n_hours AS BIGINT) AS n_hours,
       CASE WHEN s > 0 THEN 'up_then_down' WHEN s < 0 THEN 'down_then_up'
            ELSE 'none' END AS shift_shape
FROM cum
QUALIFY row_number() OVER (
  PARTITION BY event_type ORDER BY abs(s) DESC, h ASC) = 1
"""


@register("ext_changepoint_cusum", oracle=CUSUM_ORACLE)
def ext_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type CUSUM change-point: the hour where the integer
    cumulative deviation of hourly counts from the type mean peaks in
    magnitude (earliest hour on ties). All windows run on the
    calendar-bounded hourly partials."""
    from bigdata_spark_realtime_spark.plans.corpus import scoped_persist

    hourly = scoped_persist(_hourly(spark, sf_dir), "ts_cusum", keep=1)
    tot = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum("cnt").cast("bigint").alias("total"),
    )
    worder = Window.partitionBy("event_type").orderBy("h")
    wcum = worder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = (
        hourly.join(F.broadcast(tot), "event_type")
        .withColumn(
            "s",
            F.col("n_hours") * F.sum("cnt").over(wcum)
            - F.row_number().over(worder).cast("bigint") * F.col("total"),
        )
    )
    wpick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("s")).desc(), F.col("h").asc()
    )
    return (
        cum.withColumn("pick", F.row_number().over(wpick))
        .where(F.col("pick") == 1)
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH").alias("cp_hour"),
            F.col("s").cast("bigint").alias("s_peak"),
            "n_hours",
            F.expr(
                "CASE WHEN s > 0 THEN 'up_then_down' "
                "WHEN s < 0 THEN 'down_then_up' ELSE 'none' END"
            ).alias("shift_shape"),
        )
    )
