"""Referential-integrity (foreign-key) audit across the star schema.

The warehouse-hygiene sibling of the single-table contract audit
(`plans/ext_contract.py`): every load of a 100 TB star schema needs a
standing answer to "do any fact rows point at missing dimension rows?"
— orphaned facts silently vanish from inner-join dashboards. This
operator audits all five FK relations in the driver schema and emits
one row per relation: child rows, orphan rows, distinct orphan keys.

Scale (100 TB): each CHILD table is scanned exactly once —
`lineitem`'s three FKs resolve in a single pass with three left joins
(part and supplier broadcast; orders is the one genuine shuffle join,
on the same l_orderkey key every TPC-H-shaped query already uses), and
the per-relation counts fall out of one conditional aggregation, not
three rescans. Orphan-key cardinality uses count(distinct CASE...)
inside the same aggregate. Dimension-side joins (orders→customer,
customer→nation) broadcast.

Exactness: counts only — bit-identical across engines by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table


def _rel_sql(rel: str, child: str, key: str, parent: str, pkey: str) -> str:
    return f"""
SELECT '{rel}' AS relation,
       CAST(count(*) AS BIGINT) AS n_child,
       CAST(sum(CASE WHEN p.{pkey} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphans,
       CAST(count(DISTINCT CASE WHEN p.{pkey} IS NULL THEN c.{key} END)
            AS BIGINT) AS n_orphan_keys
FROM {child} c LEFT JOIN {parent} p ON p.{pkey} = c.{key}"""


FK_AUDIT_ORACLE = " UNION ALL ".join(
    [
        _rel_sql("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        _rel_sql("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        _rel_sql("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        _rel_sql(
            "lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"
        ),
        _rel_sql("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
)


def _audit_one(
    child: DataFrame, key: str, parent: DataFrame, pkey: str, rel: str, *, bcast: bool
) -> DataFrame:
    p = parent.select(F.col(pkey).alias("__pk")).distinct()
    if bcast:
        p = F.broadcast(p)
    j = child.select(F.col(key).alias("__ck")).join(
        p, F.col("__ck") == F.col("__pk"), "left"
    )
    orphan = F.col("__pk").isNull()
    return j.agg(
        F.lit(rel).alias("relation"),
        F.count(F.lit(1)).cast("bigint").alias("n_child"),
        F.sum(F.when(orphan, 1).otherwise(0)).cast("bigint").alias("n_orphans"),
        F.count_distinct(F.when(orphan, F.col("__ck")))
        .cast("bigint")
        .alias("n_orphan_keys"),
    )


@register("ext_fk_audit", oracle=FK_AUDIT_ORACLE)
def ext_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan counts for all five star-schema FK relations — the
    lineitem fact resolves its three FKs in one scan (single select of
    the three key columns feeding three joins); every dimension-sized
    parent side broadcasts."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    # lineitem: ONE scan, three joins, one reshaped aggregate
    li = lineitem.select("l_orderkey", "l_partkey", "l_suppkey")
    li = (
        li.join(
            orders.select(F.col("o_orderkey").alias("__ok")).distinct(),
            li["l_orderkey"] == F.col("__ok"),
            "left",
        )
        .join(
            F.broadcast(part.select(F.col("p_partkey").alias("__pk")).distinct()),
            F.col("l_partkey") == F.col("__pk"),
            "left",
        )
        .join(
            F.broadcast(
                supplier.select(F.col("s_suppkey").alias("__sk")).distinct()
            ),
            F.col("l_suppkey") == F.col("__sk"),
            "left",
        )
    )
    li_agg = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_child"),
        *[
            c
            for miss, key, tag in [
                (F.col("__ok").isNull(), "l_orderkey", "orders"),
                (F.col("__pk").isNull(), "l_partkey", "part"),
                (F.col("__sk").isNull(), "l_suppkey", "supplier"),
            ]
            for c in (
                F.sum(F.when(miss, 1).otherwise(0))
                .cast("bigint")
                .alias(f"o_{tag}"),
                F.count_distinct(F.when(miss, F.col(key)))
                .cast("bigint")
                .alias(f"k_{tag}"),
            )
        ],
    )
    li_rows = li_agg.selectExpr(
        "stack(3, "
        "'lineitem->orders', n_child, o_orders, k_orders, "
        "'lineitem->part', n_child, o_part, k_part, "
        "'lineitem->supplier', n_child, o_supplier, k_supplier"
        ") AS (relation, n_child, n_orphans, n_orphan_keys)"
    )
    return (
        _audit_one(orders, "o_custkey", customer, "c_custkey",
                   "orders->customer", bcast=True)
        .unionByName(li_rows)
        .unionByName(
            _audit_one(customer, "c_nationkey", nation, "n_nationkey",
                       "customer->nation", bcast=True)
        )
    )
