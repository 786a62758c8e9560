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


SESSION_WINDOW_ORACLE = f"""
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts) + INTERVAL {SESSION_GAP_MIN} MINUTES,
                '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM (
  SELECT user_id, ts, value,
         CAST(sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM (
    SELECT user_id, ts, event_id, value,
           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                 OR epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id
                                                          ORDER BY ts, event_id))
                    >= {SESSION_GAP_MIN * 60 * 1000}
                THEN 1 ELSE 0 END AS is_new_session
    FROM events
  )
)
GROUP BY user_id, sid
"""


@register("session_window_agg", oracle=SESSION_WINDOW_ORACLE)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native `session_window` aggregation — the built-in, streaming-ready
    form of gap sessionization (the same groupBy runs under a watermark
    in Structured Streaming; `streaming/sessionize.py` is the custom-
    state variant with per-user ordinals that session_window can't
    express). A session's end is last-event + gap, and a new session
    opens when an event lands AT or after the previous session's end
    (the window is [start, end)), hence the oracle's >= on the gap.

    Scale: one shuffle on user_id; Spark merges/expands session windows
    inside the aggregation — state per live session, not per event.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("sw"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
