"""Peak concurrent sessions per day — the interval-overlap sweep line.

"How many sessions were open at once?" is the classic interval
analytics question (capacity planning, license counting, live-user
peaks). The textbook answer is a global sweep: emit +1 at every
session start, −1 at every end, sort ALL boundaries, take the running
sum's maximum — a single global sort, the one plan shape this engine
bans at 100 TB.

Scale-safe shape — hierarchical prefix sum: boundaries bucket by epoch
HOUR; per-hour delta totals (a calendar-bounded frame, ≤ #hours rows
regardless of input size) get an exclusive prefix sum for each hour's
carry-in; the running sum then completes WITHIN each hour partition
and adds the carry. The only per-boundary work is one hash exchange on
the hour key + a partition-local sort of that hour's boundaries —
never a global sort. (Finer granularity — minute buckets — is the
same code with a different divisor if hour partitions ever skew.)

Determinism: boundaries order by (t_ms, delta DESC, user_id,
session_id). Within a tie group of equal (t, delta) the running values
are a permutation of the same set, so the per-day MAX is engine-
independent even though per-row prefixes are not — the output exposes
only the day aggregate. Sessions are the engine's standard gap
sessionization (`plans/sessionize.py`, 30-min gap, (ts, event_id)
tie-break), so session boundaries are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.plans.sessionize import SESSION_GAP_MIN
from bigdata_spark_realtime_spark.sources.tables import load_table

_GAP_MS = SESSION_GAP_MIN * 60 * 1000

CONCURRENCY_ORACLE = f"""
WITH marks AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > {_GAP_MS}
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id,
         CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id,
         epoch_ms(ts) AS t_ms
  FROM marks
),
iv AS (
  SELECT user_id, session_id, min(t_ms) AS st, max(t_ms) AS en
  FROM sess GROUP BY user_id, session_id
),
bnd AS (
  SELECT user_id, session_id, st AS t_ms, 1 AS delta FROM iv
  UNION ALL
  SELECT user_id, session_id, en, -1 FROM iv
),
run AS (
  SELECT t_ms, delta,
         sum(delta) OVER (ORDER BY t_ms, delta DESC, user_id, session_id
                          ROWS UNBOUNDED PRECEDING) AS conc
  FROM bnd
)
SELECT strftime(make_timestamp(t_ms * 1000), '%Y-%m-%d') AS day,
       CAST(max(conc) AS BIGINT) AS peak_concurrency,
       CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sessions_started
FROM run
GROUP BY 1
"""


@register("ext_concurrency_peak", oracle=CONCURRENCY_ORACLE)
def ext_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily peak of concurrently-open sessions via the hierarchical
    sweep line: hour-bucketed boundary deltas, exclusive prefix over
    the calendar-bounded hour totals for carry-in, partition-local
    running sum within each hour — no global sort anywhere. The
    DuckDB oracle runs the textbook global sweep; the two agree
    because carry-in + intra-hour prefix IS the global prefix."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))
    ns = F.when(F.lag("ts").over(w).isNull() | (gap > _GAP_MS), 1).otherwise(0)
    run_w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.unix_millis("ts").alias("t_ms"),
        ns.alias("ns"),
    ).withColumn("session_id", F.sum("ns").over(run_w).cast("bigint"))
    iv = sess.groupBy("user_id", "session_id").agg(
        F.min("t_ms").alias("st"), F.max("t_ms").alias("en")
    )
    # both boundaries in ONE pass over the session intervals — the
    # union form re-ran the whole sessionize window + interval groupBy
    # per boundary sign (r15 optimization round, guide §2.4)
    bnd = iv.select(
        "user_id",
        "session_id",
        F.explode(
            F.array(
                F.struct(F.col("st").alias("t_ms"), F.lit(1).alias("delta")),
                F.struct(F.col("en").alias("t_ms"), F.lit(-1).alias("delta")),
            )
        ).alias("bd"),
    ).select(
        "user_id",
        "session_id",
        "bd.t_ms",
        "bd.delta",
    ).withColumn("hr_bucket", F.expr("t_ms div 3600000"))
    # per-hour totals: calendar-bounded — the global window below runs
    # on ≤ #hours rows, never on boundary rows
    hour_tot = bnd.groupBy("hr_bucket").agg(F.sum("delta").alias("hour_delta"))
    carry_w = Window.orderBy("hr_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = hour_tot.select(
        "hr_bucket",
        F.coalesce(F.sum("hour_delta").over(carry_w), F.lit(0)).alias("carry"),
    )
    intra_w = Window.partitionBy("hr_bucket").orderBy(
        F.col("t_ms").asc(),
        F.col("delta").desc(),
        F.col("user_id").asc(),
        F.col("session_id").asc(),
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    swept = bnd.join(F.broadcast(carry), "hr_bucket").withColumn(
        "conc", F.col("carry") + F.sum("delta").over(intra_w)
    )
    return swept.groupBy(
        F.date_format(F.timestamp_millis("t_ms"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.max("conc").cast("bigint").alias("peak_concurrency"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_sessions_started"),
    )
