"""Snapshot diff — CDC at rest over last-write-wins dimension state.

Every incremental pipeline eventually answers "what changed between
yesterday's snapshot and today's?" without a change log: materialize
the keyed state at two cut points and diff them. This is the batch
mirror of the reference's CDC envelope handling (`app/ods_BaseDbApp`
routes live Maxwell deltas; SURVEY §2.3 T8) — here the deltas are
RECOVERED from plain event history, the shape used to backfill or
audit a CDC feed.

State at a cut point = each user's last event (type, value) by the
deterministic (epoch_us, event_id) order — the same last-write-wins
rule as `plans/dedup.d3_last_write_wins`. The two cut points are
derived from the data's own time span (60% / 100% of the
[min_ts, max_ts] range in integer microseconds) so every scale factor
exercises both change types.

Exactness: cut arithmetic is integer (``t_lo + (t_hi−t_lo)·6 DIV 10``);
row comparison is exact on the string type and the parquet-identical
float64 value — no derived floats anywhere.

Scale (100 TB): the ≤T2 rows subsume ≤T1's, and in production the cut
points are partition predicates (dt= pruning) on ONE scan of the
partitioned history; the unpersisted test-scale plan evaluates a
ranked window per cut (two scans — persist the shared ≤T2 slice to
collapse them when the input isn't partition-pruned). The diff itself
is a single join on user_id — key-cardinality rows, never
event-cardinality. Output: one row per user whose state was CREATED or CHANGED
between the cuts ('insert' / 'update'); unchanged keys drop out
map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

SNAPSHOT_DIFF_ORACLE = """
WITH span AS (
  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
),
cuts AS (
  SELECT lo + (hi - lo) * 6 // 10 AS t1, hi AS t2 FROM span
),
s1 AS (
  SELECT user_id, event_type, value
  FROM events, cuts
  WHERE epoch_us(ts) <= cuts.t1
  QUALIFY row_number() OVER (
    PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC
  ) = 1
),
s2 AS (
  SELECT user_id, event_type, value
  FROM events, cuts
  WHERE epoch_us(ts) <= cuts.t2
  QUALIFY row_number() OVER (
    PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC
  ) = 1
)
SELECT s2.user_id,
       CASE WHEN s1.user_id IS NULL THEN 'insert' ELSE 'update' END
         AS change_type,
       s1.event_type AS old_type,
       s2.event_type AS new_type,
       s1.value AS old_value,
       s2.value AS new_value
FROM s2 LEFT JOIN s1 USING (user_id)
WHERE s1.user_id IS NULL
   OR s1.event_type <> s2.event_type
   OR s1.value <> s2.value
"""


def _state_at(ev: DataFrame, cut_col: str) -> DataFrame:
    """Last-write-wins (event_type, value) per user among events with
    us <= the cut column already joined onto the frame."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("us").desc(), F.col("event_id").desc()
    )
    return (
        ev.where(F.col("us") <= F.col(cut_col))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "value")
    )


@register("ext_snapshot_diff", oracle=SNAPSHOT_DIFF_ORACLE)
def ext_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keys created or changed between the 60%-span and full-span
    last-write-wins snapshots: user_id, change_type, old/new state."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value",
        F.unix_micros("ts").alias("us"),
        "event_id",
    )
    span = ev.agg(
        F.min("us").alias("lo"), F.max("us").alias("hi")
    ).select(
        (F.col("lo") + F.expr("(hi - lo) * 6 DIV 10")).alias("t1"),
        F.col("hi").alias("t2"),
    )
    # 1-row cut table enters the scan side as a broadcast cross join
    evc = ev.crossJoin(F.broadcast(span))
    s1 = _state_at(evc, "t1").select(
        F.col("user_id"),
        F.col("event_type").alias("old_type"),
        F.col("value").alias("old_value"),
    )
    s2 = _state_at(evc, "t2").select(
        F.col("user_id"),
        F.col("event_type").alias("new_type"),
        F.col("value").alias("new_value"),
    )
    return (
        s2.join(s1, "user_id", "left")
        .where(
            F.col("old_type").isNull()
            | (F.col("old_type") != F.col("new_type"))
            | (F.col("old_value") != F.col("new_value"))
        )
        .select(
            "user_id",
            F.when(F.col("old_type").isNull(), F.lit("insert"))
            .otherwise(F.lit("update"))
            .alias("change_type"),
            "old_type",
            "new_type",
            "old_value",
            "new_value",
        )
    )
