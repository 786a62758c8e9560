"""Linear multi-touch attribution over the events stream table.

The credit-assignment sibling of the range join
(`plans/ext_rangejoin.py`): where that query counts conversions per
click, this one walks the arrow the other way — every `purchase`
distributes ONE unit of credit equally across ALL the user's `click`
events in the preceding hour (the "linear" model of marketing
attribution; last-touch/first-touch are degenerate cases of the same
pair expansion). The output is what a bidding/budgeting pipeline
consumes: per click, its accumulated credit and how many conversions
it participated in.

Exactness: credit is integer parts-per-million — ``SCALE DIV n_touch``
with truncating division (Spark ``DIV`` == DuckDB ``//`` for positive
operands), summed as int64. No float shares, so per-click totals are
bit-identical cross-engine and accumulation-order-independent.

Scale (100 TB): identical blocking to the range join — the interval
predicate becomes an equi-join on (user, hour-bucket) with the
purchase side exploded to buckets b−1 and b, so the shuffle is
key+bucket partitioned and never a per-user cross product. The
per-purchase touch count is a window over the PAIRS table (pair
cardinality is bounded by clicks-per-user-per-hour × purchases), and
the final credit sum groups on click cardinality. AQE's skew split
covers hot users; the 2× purchase duplication is the whole blocking
cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.ext_rangejoin import WINDOW_US
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: credit scale: one conversion = 1_000_000 parts, split per touch
CREDIT_SCALE = 1_000_000
#: skew guard: at most this many touches attribute per purchase — the
#: most RECENT clicks win (the standard last-touch recency preference).
#: A bot user firing 10⁵ clicks and 10³ purchases inside one hour
#: would otherwise materialize 10⁸ pairs under a single (user, bucket)
#: join key — the same per-key quadratic AQE cannot split that the
#: co-occurrence quota bounds (plans/ext_funnel.COOC_MAX_ITEMS_PER_USER).
#: Part of the declared contract, mirrored in the oracle.
MAX_TOUCH_PER_PURCHASE = 64

MULTITOUCH_ORACLE = f"""
WITH c AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) AS us
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS us
  FROM events WHERE event_type = 'purchase'
),
rawpairs AS (
  SELECT c.click_id, p.purchase_id, c.us AS c_us
  FROM p JOIN c
    ON c.user_id = p.user_id
   AND p.us > c.us AND p.us <= c.us + {WINDOW_US}
),
capped AS (
  SELECT click_id, purchase_id FROM rawpairs
  QUALIFY row_number() OVER (
    PARTITION BY purchase_id ORDER BY c_us DESC, click_id DESC
  ) <= {MAX_TOUCH_PER_PURCHASE}
),
pairs AS (
  SELECT click_id, purchase_id,
         count(*) OVER (PARTITION BY purchase_id) AS n_touch
  FROM capped
),
credit AS (
  SELECT click_id,
         CAST(sum({CREDIT_SCALE} // n_touch) AS BIGINT) AS credit_ppm,
         CAST(count(*) AS BIGINT) AS n_conversions
  FROM pairs GROUP BY click_id
)
SELECT c.click_id,
       CAST(coalesce(credit.credit_ppm, 0) AS BIGINT) AS credit_ppm,
       CAST(coalesce(credit.n_conversions, 0) AS BIGINT) AS n_conversions
FROM c LEFT JOIN credit USING (click_id)
"""


def credit_from_pairs(pairs: DataFrame) -> DataFrame:
    """(click_id, purchase_id, c_us) pairs → per-click credit totals,
    applying the recency touch cap then the linear split. Shared by the
    batch operator and the stream-stream twin."""
    cap_w = Window.partitionBy("purchase_id").orderBy(
        F.col("c_us").desc(), F.col("click_id").desc()
    )
    capped = (
        pairs.withColumn("tn", F.row_number().over(cap_w))
        .where(F.col("tn") <= MAX_TOUCH_PER_PURCHASE)
        .select("click_id", "purchase_id")
    )
    n_touch = F.count(F.lit(1)).over(Window.partitionBy("purchase_id"))
    return (
        capped.withColumn("n_touch", n_touch)
        .groupBy("click_id")
        .agg(
            F.sum(F.expr(f"{CREDIT_SCALE} DIV n_touch"))
            .cast("bigint")
            .alias("credit_ppm"),
            F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
        )
    )


@register("ext_multitouch_attribution", oracle=MULTITOUCH_ORACLE)
def ext_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-click linear attribution credit (ppm) and conversion count
    over a 1-hour lookback window; unconverted clicks keep explicit
    zeros (left semantics — the negatives a bid model trains on)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.unix_micros("ts").alias("c_us"),
        F.expr(f"unix_micros(ts) DIV {WINDOW_US}").alias("c_bucket"),
    )
    # blocking mirrors ext_range_join_attribution with the roles
    # swapped: a click in [p_us - 1h, p_us) sits in the purchase's own
    # hour bucket or the previous one
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.unix_micros("ts").alias("p_us"),
        )
        .select(
            "purchase_id",
            "p_user",
            "p_us",
            F.explode(
                F.array(
                    F.expr(f"p_us DIV {WINDOW_US} - 1"),
                    F.expr(f"p_us DIV {WINDOW_US}"),
                )
            ).alias("p_bucket"),
        )
    )
    pairs = clicks.join(
        purchases,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_bucket") == F.col("c_bucket"))
        & (F.col("p_us") > F.col("c_us"))
        & (F.col("p_us") <= F.col("c_us") + WINDOW_US),
    ).select("click_id", "purchase_id", "c_us")
    credit = credit_from_pairs(pairs)
    return (
        clicks.select("click_id")
        .join(credit, "click_id", "left")
        .select(
            "click_id",
            F.coalesce("credit_ppm", F.lit(0)).cast("bigint").alias(
                "credit_ppm"
            ),
            F.coalesce("n_conversions", F.lit(0)).cast("bigint").alias(
                "n_conversions"
            ),
        )
    )
