"""Analytic-window / grouping-set / percentile / set-operation queries.

None of these exist in the reference (SURVEY.md §2.7 "no grouping sets /
rollup / cube", §2.8 "no set operations") — they are engine-native OLAP
breadth a user migrating off the reference's ES query layer gains for
free. Every query here is fully oracle-checked against DuckDB.

Scale notes common to the module: window functions shuffle once on their
partition key and then run as a sorted, streaming pass per partition —
state is one frame, not one partition, so a hot customer never OOMs an
executor. Grouping sets expand inside a single partial+final hash
aggregation (no second scan per subtotal level).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

SEQ_ORACLE = """
SELECT o_custkey AS cust_id,
       o_orderkey AS order_id,
       row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS seq,
       round(coalesce(lag(o_totalprice) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey), 0.0), 2) AS prev_total,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_total,
       round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
         AS moving_avg3
FROM orders
"""


@register("analytic_order_sequence", oracle=SEQ_ORACLE)
def analytic_order_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order history analytics: sequence number, previous
    order value (lag), running lifetime spend, 3-order moving average —
    the classic customer-journey window stack.

    One shuffle on o_custkey, then a single sorted pass; the running/
    moving frames hold O(frame) state. (o_orderdate, o_orderkey) is a
    total order within each customer, so lag/cumsum are deterministic
    and the oracle hash is stable.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    return o.select(
        F.col("o_custkey").alias("cust_id"),
        F.col("o_orderkey").alias("order_id"),
        F.row_number().over(w).cast("long").alias("seq"),
        F.round(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 2).alias(
            "prev_total"
        ),
        F.round(F.sum("o_totalprice").over(cum), 2).alias("running_total"),
        F.round(F.avg("o_totalprice").over(mov), 4).alias("moving_avg3"),
    )


CUBE_ORACLE = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 2)
         AS total_amount
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("cube_status_priority", oracle=CUBE_ORACLE)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping-set levels — per
    cell, per status, per priority, grand total — in one aggregation
    pass. Subtotal rows label their collapsed dimension 'ALL' (source
    columns are non-null, so the coalesce is unambiguous).

    The ``()`` grouping set is derived by re-aggregating the status-
    level subtotal rows rather than left to Spark's cube: ANSI gives the
    empty set exactly one grand-total row even over zero input rows,
    Spark's expand+hash-agg gives none (DuckDB emits it; empty-input
    sweep catch). The re-agg runs over ≤#statuses rows — no second
    corpus pass — and returns its one row unconditionally.

    Money sums are integer cents end-to-end (the ``_cent_sum`` pattern
    of plans/tpch.py: both engines round each leaf value to exact cents
    and sum BIGINT), so every subtotal level AND the re-aggregated
    grand total are order-independent integer arithmetic — the
    round(x, 2) half-cent boundary the r13 advisor flagged is
    unreachable by construction."""
    from bigdata_spark_realtime_spark.plans.corpus import scoped_persist

    def build_lvl() -> DataFrame:
        o = load_table(spark, sf_dir, "orders")
        return o.groupingSets(
            [
                ["o_orderstatus", "o_orderpriority"],
                ["o_orderstatus"],
                ["o_orderpriority"],
            ],
            "o_orderstatus",
            "o_orderpriority",
        ).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            ).alias("cents"),
            F.grouping_id().alias("gid"),
        )

    # feeds the output projection AND the grand-total re-agg; subtotal
    # cardinality (statuses×priorities + statuses + priorities rows).
    # The total branch is built from a SECOND canonically-identical
    # plan: a self-union of one frame trips deduplicateRelations and
    # the re-aliased branch misses the cache, silently recomputing the
    # corpus aggregation (see rollup_region_nation)
    lvl = scoped_persist(build_lvl(), "cube_status_priority", keep=1)
    lvl2 = build_lvl()
    detail = lvl.select(
        F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
        F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
        "n_orders",
        F.round(F.col("cents") / 100.0, 2).alias("total_amount"),
    )
    total = (
        lvl2.where(F.col("gid") == 1)  # status-level rows (priority bit)
        .agg(
            F.coalesce(F.sum("n_orders"), F.lit(0))
            .cast("bigint")
            .alias("n_orders"),
            F.round(F.sum("cents") / 100.0, 2).alias("total_amount"),
        )
        .select(
            F.lit("ALL").alias("status"),
            F.lit("ALL").alias("priority"),
            "n_orders",
            "total_amount",
        )
    )
    return detail.unionByName(total)


PCTL_ORACLE = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 4)      AS p50_qty,
       round(quantile_cont(l_quantity, 0.9), 4)      AS p90_qty,
       round(quantile_cont(l_extendedprice, 0.95), 2) AS p95_price
FROM lineitem
GROUP BY l_returnflag
"""


@register("exact_percentiles", oracle=PCTL_ORACLE)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) percentiles per return flag. Spark's
    `percentile` and DuckDB's `quantile_cont` both use linear
    interpolation, so the values hash-match — this is the exact
    counterpart to the sketch-based `approx_aggregates` (rows-only);
    at 100 TB the sketch is the scale path, this is the audit path."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 2).alias("p95_price"),
    )


SETOPS_ORACLE = """
WITH y96 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
), y97 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT 'retained'  AS cohort, o_custkey AS cust_id
  FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
UNION ALL
SELECT 'churned'   AS cohort, o_custkey AS cust_id
  FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)
UNION ALL
SELECT 'new'       AS cohort, o_custkey AS cust_id
  FROM (SELECT o_custkey FROM y97 EXCEPT SELECT o_custkey FROM y96)
"""


@register("set_ops_customer_cohorts", oracle=SETOPS_ORACLE)
def set_ops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year customer cohorts via set operations: INTERSECT
    (retained), EXCEPT (churned / new), UNION ALL to assemble. Each set
    op compiles to an aggregate or left-anti hash join on the already-
    deduplicated (small) key sets — the year filters prune the fact scan
    first, so the set ops never see raw fact rows."""
    o = load_table(spark, sf_dir, "orders")

    def active(y0: str, y1: str) -> DataFrame:
        return (
            o.where(
                (F.col("o_orderdate") >= F.lit(f"{y0}-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y1}-01-01 00:00:00").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    y96, y97 = active("1996", "1997"), active("1997", "1998")
    label = lambda df, name: df.select(  # noqa: E731
        F.lit(name).alias("cohort"), F.col("o_custkey").alias("cust_id")
    )
    return (
        label(y96.intersect(y97), "retained")
        .unionByName(label(y96.subtract(y97), "churned"))
        .unionByName(label(y97.subtract(y96), "new"))
    )


BUCKETED_ORACLE = """
SELECT o.o_orderpriority AS priority,
       count(*) AS n_lines,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
ORDER BY 1
"""


@register("bucketed_colocated_join", oracle=BUCKETED_ORACLE)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The big-fact join over bucketed tables: orders and lineitem are
    written bucketed+sorted by order key (sources/bucketing.py), so the
    sort-merge join reads co-located buckets with NO Exchange on either
    side — the one per-query shuffle this schema has, paid once at write
    time instead. Same rows as the plain join (this oracle); the
    exchange-free plan shape is asserted in tests/test_bucketing.py."""
    from bigdata_spark_realtime_spark.sources.bucketing import colocated_order_join

    joined = colocated_order_join(spark, sf_dir)
    return (
        joined.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("priority")
    )


W7_ORACLE = """
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS ct,
       round(sum(value), 2) AS total_value
FROM (
  SELECT value,
         unnest([time_bucket(INTERVAL 6 HOURS, ts),
                 time_bucket(INTERVAL 6 HOURS, ts) - INTERVAL 6 HOURS]) AS ws
  FROM events
)
GROUP BY 1
"""


@register("w7_sliding_window_agg", oracle=W7_ORACLE)
def w7_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12-hour windows sliding every 6 hours: each event lands in exactly
    size/slide = 2 windows. Spark expands the windows before the hash
    aggregation (same partial+final shape as tumbling, 2× the partial
    rows); the oracle makes the expansion explicit with unnest of the
    two epoch-aligned starts each event belongs to."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "12 hours", "6 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("ct"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "ct",
            "total_value",
        )
    )
