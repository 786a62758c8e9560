"""Rolling active users, fulfillment latency, and revenue unpivot.

- **`ext_rolling_wau`** — DAU, rolling 7-day active users (WAU) and
  the DAU/WAU stickiness ratio per day. The naive WAU is a
  count-distinct over a sliding window — a shape Spark cannot
  partial-aggregate. The scale shape used here: reduce to distinct
  (user, day) once, then EXPLODE each activity day onto the ≤ 7
  report days it supports (a bounded ×7 fan-out of user-day rows, not
  raw events) and count distinct per report day — turning the sliding
  window into a plain keyed aggregation with map-side combine.
  Report days clamp to the observed [min, max] span so the output is
  a pure function of the data; a day whose whole window is silent
  (WAU = 0) emits no row — the declared contract, pinned by the
  planted test.
- **`ext_fulfillment_latency`** — per order priority: exact rank-based
  median and max of (last shipment − order date) in days, over the
  orders ⋈ lineitem join (the bucketed-join pair at 100 TB). The
  latency aggregates per order first (orders-cardinality rows), then
  the rank window runs per priority.
- **`ext_revenue_unpivot`** — the long-format revenue decomposition:
  gross / discount / tax cents per month UNPIVOTed into
  (month, component, cents) rows via `stack` — the inverse of the
  pivot operator the engine already carries, exact integer cents.

All arithmetic int64; medians are rank picks ((n+1) DIV 2), never
float percentiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

PPM = 1_000_000
WAU_DAYS = 7

ROLLING_WAU_ORACLE = f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events
),
bounds AS (SELECT min(day) AS mn, max(day) AS mx FROM ud),
contrib AS (
  SELECT ud.user_id, ud.day + u.o AS rday
  FROM ud, unnest(range({WAU_DAYS})) AS u(o), bounds b
  WHERE ud.day + u.o BETWEEN b.mn AND b.mx
),
wau AS (
  SELECT rday AS day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
  FROM contrib GROUP BY rday
),
dau AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
  FROM ud GROUP BY day
)
SELECT strftime(make_timestamp(w.day * 86400000000), '%Y-%m-%d') AS day,
       coalesce(d.dau, 0) AS dau,
       w.wau,
       ({PPM} * coalesce(d.dau, 0)) // w.wau AS stickiness_ppm
FROM wau w LEFT JOIN dau d ON d.day = w.day
"""


@register("ext_rolling_wau", oracle=ROLLING_WAU_ORACLE)
def ext_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day DAU, rolling {WAU_DAYS}-day WAU and stickiness ppm:
    distinct (user, day) once, bounded ×{WAU_DAYS} explode onto report
    days, keyed count-distincts — no sliding count-distinct window
    anywhere."""
    ud = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .distinct()
    )
    from bigdata_spark_realtime_spark.plans.corpus import scoped_persist

    # consumed by bounds, the explode AND the dau aggregate
    ud = scoped_persist(ud, "rolling_wau", keep=1)
    bounds = ud.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    contrib = (
        ud.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.col("day") + (WAU_DAYS - 1))
            ).alias("rday"),
            "mn",
            "mx",
        )
        .where(F.col("rday").between(F.col("mn"), F.col("mx")))
    )
    wau = contrib.groupBy(F.col("rday").alias("day")).agg(
        F.count_distinct("user_id").cast("bigint").alias("wau")
    )
    dau = ud.groupBy("day").agg(
        F.count_distinct("user_id").cast("bigint").alias("dau")
    )
    return (
        wau.join(dau, "day", "left")
        .select(
            F.date_format(
                F.timestamp_micros(F.col("day") * 86_400_000_000), "yyyy-MM-dd"
            ).alias("day"),
            F.coalesce("dau", F.lit(0)).cast("bigint").alias("dau"),
            "wau",
            F.expr(f"({PPM} * coalesce(dau, 0)) div wau").alias(
                "stickiness_ppm"
            ),
        )
    )


FULFILLMENT_ORACLE = """
WITH per_order AS (
  SELECT o.o_orderkey, o.o_orderpriority,
         datediff('day', o.o_orderdate, max(l.l_shipdate)) AS latency_days
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
),
ranked AS (
  SELECT o_orderpriority, latency_days,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY latency_days, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n,
         max(latency_days) OVER (PARTITION BY o_orderpriority) AS mx
  FROM per_order
)
SELECT o_orderpriority,
       CAST(n AS BIGINT) AS n_orders,
       CAST(latency_days AS BIGINT) AS median_latency_days,
       CAST(mx AS BIGINT) AS max_latency_days
FROM ranked
WHERE rn = (n + 1) // 2
"""


@register("ext_fulfillment_latency", oracle=FULFILLMENT_ORACLE)
def ext_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order priority: exact rank-median and max of order→last-
    shipment latency in days — the orders ⋈ lineitem shape (bucketed
    co-located at 100 TB), latencies reduced per order before the
    priority-keyed rank window."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    per_order = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.datediff("last_ship", "o_orderdate").alias("latency_days"),
        )
    )
    wrank = Window.partitionBy("o_orderpriority").orderBy(
        "latency_days", "o_orderkey"
    )
    wall = Window.partitionBy("o_orderpriority")
    ranked = per_order.select(
        "o_orderpriority",
        "latency_days",
        F.row_number().over(wrank).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.max("latency_days").over(wall).alias("mx"),
    )
    return ranked.where(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "o_orderpriority",
        F.col("n").cast("bigint").alias("n_orders"),
        F.col("latency_days").cast("bigint").alias("median_latency_days"),
        F.col("mx").cast("bigint").alias("max_latency_days"),
    )


UNPIVOT_ORACLE = """
WITH m AS (
  SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
         CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS gross_cents,
         CAST(sum(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT))
              AS BIGINT) AS discount_cents,
         CAST(sum(CAST(floor(l_extendedprice * l_tax * 100) AS BIGINT))
              AS BIGINT) AS tax_cents
  FROM lineitem GROUP BY 1
)
SELECT month, 'gross' AS component, gross_cents AS cents FROM m
UNION ALL SELECT month, 'discount', discount_cents FROM m
UNION ALL SELECT month, 'tax', tax_cents FROM m
"""


@register("ext_revenue_unpivot", oracle=UNPIVOT_ORACLE)
def ext_revenue_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue decomposition UNPIVOTed to long format via
    `stack` — exact per-row integer cents (floor before sum), one
    map-side-combined reduction then a 3× widening of month-cardinality
    rows only."""
    m = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias(
                "month"
            )
        )
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("gross_cents"),
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * F.col("l_discount") * 100
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("discount_cents"),
            F.sum(
                F.floor(F.col("l_extendedprice") * F.col("l_tax") * 100).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("tax_cents"),
        )
    )
    return m.selectExpr(
        "month",
        "stack(3, 'gross', gross_cents, 'discount', discount_cents, "
        "'tax', tax_cents) AS (component, cents)",
    )
