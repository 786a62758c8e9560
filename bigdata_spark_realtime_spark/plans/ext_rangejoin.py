"""Range (interval) join over the events stream table.

The attribution query every clickstream pipeline runs — for each
`click`, how many `purchase` events did the same user make within the
following hour — and the canonical *range join*: an equi-key plus an
interval predicate, which naive engines execute as a per-user cross
product. Complements the engine's as-of join (`plans/ext_asof.py`,
nearest-one-sided match) with the bounded-window many-match form.

Scale (100 TB): the interval predicate is turned into an equi-join by
TIME-BUCKET BLOCKING — each click is exploded to its hour bucket b and
b+1 (any purchase in ``(ts, ts+1h]`` lands in one of the two), the join
runs on ``(user_id, bucket)``, and the exact interval filter prunes the
block edges. The shuffle carries only (key, bucket)-partitioned rows —
never a per-user cross product — and AQE's skew split handles hot keys.
The 2× click-side duplication is the entire blocking cost.

Exactness: both engines compare integer epoch-microseconds
(``unix_micros`` / ``epoch_us``); the bucket is a truncating integer
division. No float time arithmetic anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: attribution window (microseconds): 1 hour
WINDOW_US = 3_600_000_000

RANGE_JOIN_ORACLE = f"""
WITH c AS (
  SELECT event_id, user_id, epoch_us(ts) AS us
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, epoch_us(ts) AS us
  FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id AS click_id,
       CAST(count(p.us) AS BIGINT) AS n_purchases
FROM c LEFT JOIN p
  ON p.user_id = c.user_id
 AND p.us > c.us AND p.us <= c.us + {WINDOW_US}
GROUP BY c.event_id
"""


@register("ext_range_join_attribution", oracle=RANGE_JOIN_ORACLE)
def ext_range_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-click purchase count within the next hour (left semantics:
    unconverted clicks keep an explicit 0 — they are the negative
    examples a conversion model trains on)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.unix_micros("ts").alias("c_us"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.unix_micros("ts").alias("p_us"),
        F.expr(f"unix_micros(ts) DIV {WINDOW_US}").alias("p_bucket"),
    )
    # time-bucket blocking: a purchase in (c_us, c_us + 1h] sits in the
    # click's own hour bucket or the next one
    blocked = clicks.select(
        "click_id",
        "c_user",
        "c_us",
        F.explode(
            F.array(
                F.expr(f"c_us DIV {WINDOW_US}"),
                F.expr(f"c_us DIV {WINDOW_US} + 1"),
            )
        ).alias("c_bucket"),
    )
    hits = (
        blocked.join(
            purchases,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("p_bucket") == F.col("c_bucket"))
            & (F.col("p_us") > F.col("c_us"))
            & (F.col("p_us") <= F.col("c_us") + WINDOW_US),
        )
        .groupBy("click_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    # output is keyed by click_id (the oracle's GROUP BY c.event_id):
    # under at-least-once ingestion a replayed click row collapses to
    # ONE output row — the round-14 duplicate-key sweep caught the old
    # per-input-row left join emitting one row per replay. Pair counts
    # still count every (click-copy, purchase-row) pair, mirroring the
    # oracle exactly; on unique-key data distinct() is the identity.
    return (
        clicks.select("click_id")
        .distinct()
        .join(hits, "click_id", "left")
        .select(
            "click_id",
            F.coalesce(F.col("n_purchases"), F.lit(0))
            .cast("bigint")
            .alias("n_purchases"),
        )
    )
