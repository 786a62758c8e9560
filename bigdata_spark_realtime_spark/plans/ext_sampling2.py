"""Weighted priority sampling (Duffield-Lund-Thorup 2007).

The sampling family (`plans/ext_sampling.py`) draws uniformly by hash
rate; training-data curation also needs WEIGHTED draws — sample events
proportionally to their value so the sample preserves revenue/impact
totals, not just row counts. Priority sampling is the standard
one-pass scheme: each item gets priority w/u for a uniform u ∈ (0,1],
and the k highest priorities form the sample (inclusion probability
∝ weight, unbiased Horvitz-Thompson estimates).

Determinism: u is the md5-derived h32 of the event id, so both
engines draw the IDENTICAL pseudo-uniform; the priority is kept
integer as (w << 32) DIV (h32+1) — no float division anywhere, ties
broken by event_id. Weights are cents+1 so zero-value rows keep a
nonzero inclusion probability.

Scale (100 TB): priorities are map-side expressions; the top-K
compiles to TakeOrderedAndProject (per-partition heap + single merge
of K rows), never a global sort. K rows leave the cluster, period.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.functions import hashing as H
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: sample size
PRIORITY_K = 500

PRIORITY_SAMPLE_ORACLE = f"""
WITH w AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100) AS BIGINT) + 1 AS w_cents,
         {H.h32_sql("CAST(event_id AS VARCHAR)")} + 1 AS u
  FROM events
)
SELECT event_id, event_type, w_cents,
       (w_cents << 32) // u AS priority
FROM w
ORDER BY priority DESC, event_id ASC
LIMIT {PRIORITY_K}
"""


@register("ext_weighted_sample_priority", oracle=PRIORITY_SAMPLE_ORACLE)
def ext_weighted_sample_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PRIORITY_K} events by integer priority (w<<32) DIV
    (h32(event_id)+1) — deterministic weighted priority sample, map-
    side priorities + TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        (F.floor(F.col("value") * 100).cast("bigint") + 1).alias("w_cents"),
        (H.h32(F.col("event_id").cast("string")) + 1).alias("u"),
    )
    return (
        ev.select(
            "event_id",
            "event_type",
            "w_cents",
            F.expr("shiftleft(w_cents, 32) div u").alias("priority"),
        )
        .orderBy(F.col("priority").desc(), F.col("event_id").asc())
        .limit(PRIORITY_K)
    )
