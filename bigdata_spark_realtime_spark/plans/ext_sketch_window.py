"""Time-grained HLL: hourly distinct-user sketches that ROLL UP.

The operational shape sketches exist for at 100 TB: maintain distinct
counts per fine grain (hour), answer any coarser grain (day, week,
campaign window) by MERGING register states — never by re-scanning
raw data. This query is the sketch-family sibling of
`plans/ext_rollup.ext_rollup_cascade`: it emits the per-(hour, type)
HLL register state AND the per-(day, type) state computed by
register-max over the hourly partials, while the oracle computes the
day grain DIRECTLY from raw events — the hash match is a proof that
the max-merge is lossless (register max is associative and
idempotent, so any partition of the input into hours merges back to
the exact same day registers).

State integers are the shared deterministic HLL of
`plans/ext_sketch.py` (md5 h32 buckets, ``25 − length(bin(w))`` rank,
``Σ 2^(50−reg)`` scaled harmonic denominator — no float anywhere).

Scale (100 TB): raw is scanned once for the hourly grain (one
(hour, type, bucket) shuffle with map-side partial max); the day
grain re-aggregates hour × type × 256-row register partials. Streaming
production keeps the hourly registers in the state store exactly like
`stream_hll_distinct` and runs the day merge on the drained frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.functions import hashing as H
from bigdata_spark_realtime_spark.plans.ext_sketch import M, S
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

_SCALED_SQL = (
    f"CAST(sum(1::BIGINT << ({S} - reg))"
    f" + ({M} - count(*)) * (1::BIGINT << {S}) AS BIGINT)"
)

HLL_HOURLY_ORACLE = f"""
WITH ranked AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         strftime(ts, '%Y-%m-%d %H') AS hour,
         event_type,
         {H.h32_sql("CAST(user_id AS VARCHAR)")} % {M} AS bucket,
         CASE WHEN {H.h32_sql("CAST(user_id AS VARCHAR)")} // {M} = 0 THEN 25
              ELSE 25 - length(bin(
                {H.h32_sql("CAST(user_id AS VARCHAR)")} // {M})) END AS rank
  FROM events
),
hregs AS (
  SELECT day, hour, event_type, bucket, max(rank) AS reg
  FROM ranked GROUP BY day, hour, event_type, bucket
),
hourly AS (
  SELECT 'hour' AS grain, hour AS period, event_type,
         {_SCALED_SQL} AS sum_scaled,
         CAST(count(*) AS BIGINT) AS nonzero
  FROM hregs GROUP BY hour, event_type
),
dregs AS (
  -- day registers DIRECTLY from raw (not from hregs): the Spark side
  -- merges hourly partials instead, so the hash match proves the
  -- register-max merge lossless
  SELECT day, event_type, bucket, max(rank) AS reg
  FROM ranked GROUP BY day, event_type, bucket
),
daily AS (
  SELECT 'day' AS grain, day AS period, event_type,
         {_SCALED_SQL} AS sum_scaled,
         CAST(count(*) AS BIGINT) AS nonzero
  FROM dregs GROUP BY day, event_type
)
SELECT * FROM hourly UNION ALL SELECT * FROM daily
"""


@register("ext_hll_hourly_rollup", oracle=HLL_HOURLY_ORACLE)
def ext_hll_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(hour, event_type) HLL register state plus the day grain
    obtained by max-merging the hourly registers (raw never
    re-scanned); oracle recomputes the day grain from raw."""
    ev = load_table(spark, sf_dir, "events")
    hv = H.h32(F.col("user_id").cast("string"))
    w = F.expr(f"hv DIV {M}")
    rank = F.when(w == 0, 25).otherwise(25 - F.length(F.bin(w)))
    ranked = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.date_format("ts", "yyyy-MM-dd HH").alias("hour"),
        "event_type",
        hv.alias("hv"),
    ).select(
        "day",
        "hour",
        "event_type",
        F.expr(f"hv % {M}").alias("bucket"),
        rank.alias("rank"),
    )
    hregs = ranked.groupBy("day", "hour", "event_type", "bucket").agg(
        F.max("rank").alias("reg")
    )
    # both grains consume hregs (hourly state + the day merge): persist
    # the hour×type×256-row register frame so raw is scanned once, as
    # the module doc promises (scoped: previous invocation evicted)
    from bigdata_spark_realtime_spark.plans.corpus import scoped_persist

    hregs = scoped_persist(hregs, "hll_hourly_regs", keep=1)
    scaled = (
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {S} - reg)"))
        + (M - F.count(F.lit(1))) * F.lit(1 << S)
    ).cast("bigint")
    hourly = hregs.groupBy("hour", "event_type").agg(
        scaled.alias("sum_scaled"),
        F.count(F.lit(1)).cast("bigint").alias("nonzero"),
    ).select(
        F.lit("hour").alias("grain"),
        F.col("hour").alias("period"),
        "event_type",
        "sum_scaled",
        "nonzero",
    )
    # the merge: day registers = elementwise MAX over the hourly
    # partials — hour-count-bounded rows, raw untouched
    dregs = hregs.groupBy("day", "event_type", "bucket").agg(
        F.max("reg").alias("reg")
    )
    daily = dregs.groupBy("day", "event_type").agg(
        scaled.alias("sum_scaled"),
        F.count(F.lit(1)).cast("bigint").alias("nonzero"),
    ).select(
        F.lit("day").alias("grain"),
        F.col("day").alias("period"),
        "event_type",
        "sum_scaled",
        "nonzero",
    )
    return hourly.unionByName(daily)
