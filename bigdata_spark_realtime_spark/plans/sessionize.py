"""Sessionization + pivot — beyond-reference operators rounding out the
analytics surface (the reference's dashboard JS references pagePath /
visit-session endpoints that were never implemented server-side —
SURVEY.md §2.11; these are the engine-native equivalents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.functions import scalar as fns
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

SESSION_GAP_MIN = 30

SESSIONIZE_ORACLE = f"""
SELECT user_id, session_id,
       count(*) AS n_events,
       max(epoch_ms(ts)) - min(epoch_ms(ts)) AS duration_ms
FROM (
  SELECT user_id, ts,
         CAST(sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                 OR epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id
                                                          ORDER BY ts, event_id))
                    > {SESSION_GAP_MIN * 60 * 1000}
                THEN 1 ELSE 0 END AS is_new_session
    FROM events
  )
)
GROUP BY 1, 2
"""


@register("sessionize_events", oracle=SESSIONIZE_ORACLE)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: lag + running sum of session starts.
    In streaming the same semantics come from `session_window(ts, gap)`;
    batch uses the window-function form (one shuffle on user_id)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))
    new_session = F.when(
        F.lag("ts").over(w).isNull() | (gap > SESSION_GAP_MIN * 60 * 1000), 1
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ev.withColumn("is_new_session", new_session)
        .withColumn("session_id", F.sum("is_new_session").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(F.unix_millis("ts")) - F.min(F.unix_millis("ts"))).alias(
                "duration_ms"
            ),
        )
    )


EVENT_TYPES = ("click", "view", "purchase", "signup", "error")

PIVOT_ORACLE = f"""
SELECT {fns.dt_sql('ts')} AS dt,
       {', '.join(f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}" for t in EVENT_TYPES)}
FROM events
GROUP BY 1
"""


@register("pivot_event_counts", oracle=PIVOT_ORACLE)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-type pivot via an explicit value list — pivot with
    known values is a single partial+final aggregation, no extra pass to
    discover columns."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(fns.dt_col("ts").alias("dt"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .select(
            "dt",
            *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES],
        )
    )
