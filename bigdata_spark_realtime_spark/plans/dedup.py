"""Deduplication operators — SURVEY.md §2.5 (D1-D3), batch-mode semantics.

The reference implements first-seen dedup with a Redis SADD round-trip
per record (`app/dwd_DauApp.scala:84-111`) and last-write-wins via ES
doc-id overwrites (`app/dwd_DauApp.scala:190`). Here both are window
ranks — fully partition-parallel, one shuffle on the dedup key, no
external I/O. The streaming twin (`dropDuplicates` + watermark) lives in
``streaming/dau.py``; batch and stream agree because the winner ordering
is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.functions import scalar as fns
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# D1 — first-seen-per-key-per-day dedup: key = (event-date, user), winner =
# earliest (ts, event_id). Matches the Redis SADD first-wins semantics with
# a deterministic tiebreak (the reference's "first" was arrival order).
# ---------------------------------------------------------------------------

D1_ORACLE = f"""
SELECT dt, user_id, event_id, event_type, hr FROM (
  SELECT {fns.dt_sql('ts')} AS dt,
         user_id, event_id, event_type,
         {fns.hr_sql('ts')} AS hr,
         row_number() OVER (PARTITION BY {fns.dt_sql('ts')}, user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
"""


@register("d1_first_seen_dedup", oracle=D1_ORACLE)
def d1_first_seen_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        fns.dt_col("ts").alias("dt"),
        "user_id",
        "event_id",
        "event_type",
        fns.hr_col("ts").alias("hr"),
        "ts",
    )
    w = Window.partitionBy("dt", "user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("dt", "user_id", "event_id", "event_type", "hr")
    )


# ---------------------------------------------------------------------------
# D3 — idempotent-sink dedup (last write wins on the doc id): key = user,
# winner = latest (ts, event_id). Replays/overwrites collapse to one row,
# like the ES doc-id upsert.
# ---------------------------------------------------------------------------

D3_ORACLE = """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


@register("d3_last_write_wins", oracle=D3_ORACLE)
def d3_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
        )
    )
