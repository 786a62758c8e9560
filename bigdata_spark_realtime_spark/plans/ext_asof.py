"""As-of join over the star schema, oracle-checked against DuckDB's
native ASOF JOIN: each event is matched with the user's most recent
order at-or-before the event time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.operators.asof import asof_join
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

# orders are not unique per (custkey, orderdate) — reduce to a
# deterministic representative (max orderkey) so the as-of winner is
# well-defined in both engines
ASOF_ORACLE = """
WITH o1 AS (
  SELECT o_custkey, o_orderdate, CAST(max(o_orderkey) AS BIGINT) AS last_order_id
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ts_ms,
       o.last_order_id,
       strftime(o.o_orderdate, '%Y-%m-%d') AS last_order_date
FROM events e
ASOF LEFT JOIN o1 o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
"""


@register("ext_asof_join", oracle=ASOF_ORACLE)
def ext_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-and-window as-of join (see operators/asof.py): one shuffle on
    the user key, no pairwise product — vs DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("last_order_id"))
        .withColumn("last_order_date", F.date_format("o_orderdate", "yyyy-MM-dd"))
    )
    joined = asof_join(
        ev,
        orders,
        on=("user_id", "o_custkey"),
        time=("ts", "o_orderdate"),
        payload=["last_order_id", "last_order_date"],
    )
    return joined.select(
        "event_id", "user_id", F.unix_millis("ts").alias("ts_ms"),
        "last_order_id", "last_order_date",
    )
