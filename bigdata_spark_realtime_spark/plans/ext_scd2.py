"""SCD Type-2 interval construction from plain event history.

The warehouse-dimension builder: collapse each user's event stream
into validity intervals — one row per consecutive run of the same
state with ``[valid_from, valid_to)`` bounds, the open interval
(``valid_to = OPEN_US``, the int64-max "9999-12-31" convention — a
sentinel rather than NULL so the column stays non-null BIGINT through
every engine and hash) being current. This is the table an as-of join
(`plans/ext_asof.py`) probes and the versioned dimension a Type-2
warehouse maintains; building it FROM history is the backfill path
(the live path is the CDC envelope, SURVEY §2.3 T8).

Classic gaps-and-islands: a change flag (state differs from the
previous event's), a running sum of flags as the island id, then one
row per island with ``lead()`` supplying the exclusive upper bound.
All ordering is the integer composite (epoch_us, event_id) — the
engine's standard deterministic tie-break. The runs-level lead window
additionally tiebreaks on the island id: a same-microsecond state flip
produces two runs with identical ``valid_from_us``, and ordering by
``(valid_from_us, isl)`` (isl is monotone with event order) makes the
zero-width interval land deterministically on the EARLIER island on
both engines — without it the assignment is engine-dependent.

Scale (100 TB): two windows and one groupBy, all partitioned by
user_id — per-partition state is a user's own event count, and the
output is run-cardinality (≤ events, typically ≪). The day-bounded
variant (partition by (user, day), as in
`ext_event_transitions_daily`) caps per-partition sorts for unbounded
histories; intervals then never span days, which is exactly how a
partitioned SCD2 table is laid out anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: open-interval sentinel (int64 max): the "valid until forever" bound
OPEN_US = (1 << 63) - 1

SCD2_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, event_type AS state, epoch_us(ts) AS us, event_id,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS prev_state
  FROM events
),
flagged AS (
  SELECT user_id, state, us, event_id,
         CASE WHEN prev_state IS NULL OR prev_state <> state
              THEN 1 ELSE 0 END AS chg
  FROM ordered
),
islands AS (
  SELECT user_id, state, us,
         sum(chg) OVER (
           PARTITION BY user_id ORDER BY us, event_id
         ) AS isl
  FROM flagged
),
runs AS (
  SELECT user_id, isl, min(state) AS state,
         CAST(min(us) AS BIGINT) AS valid_from_us,
         CAST(count(*) AS BIGINT) AS n_events
  FROM islands GROUP BY user_id, isl
)
SELECT user_id, state, valid_from_us,
       CAST(coalesce(lead(valid_from_us) OVER (
         PARTITION BY user_id ORDER BY valid_from_us, isl
       ), {OPEN_US}) AS BIGINT) AS valid_to_us,
       n_events
FROM runs
"""


@register("ext_scd2_intervals", oracle=SCD2_ORACLE)
def ext_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user state validity intervals (gaps-and-islands over the
    deterministic (epoch_us, event_id) order); open interval =
    OPEN_US (int64 max) valid_to_us."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = ev.withColumn(
        "chg",
        F.when(
            F.lag("state").over(w).isNull()
            | (F.lag("state").over(w) != F.col("state")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn("isl", F.sum("chg").over(w))
    runs = islands.groupBy("user_id", "isl").agg(
        F.min("state").alias("state"),
        F.min("us").cast("bigint").alias("valid_from_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    # tiebreak by isl (monotone with event order): a same-microsecond
    # state flip yields two runs with identical valid_from_us, and
    # without the tiebreak valid_to_us assignment is engine-dependent.
    # The earlier island deterministically gets the zero-width interval;
    # downstream as-of probes (ext_pit) filter those out.
    w2 = Window.partitionBy("user_id").orderBy("valid_from_us", "isl")
    return runs.select(
        "user_id",
        "state",
        "valid_from_us",
        F.coalesce(F.lead("valid_from_us").over(w2), F.lit(OPEN_US))
        .cast("bigint")
        .alias("valid_to_us"),
        "n_events",
    )
