"""Data-contract audit: declarative row-level rules, one scan, one row
per rule.

The ingestion gate a production pipeline runs before letting a batch
into the lake: each rule is a boolean predicate over a row; the audit
reports, per rule, how many rows were checked, how many violate it,
and the smallest violating key (a deterministic reproducer — "go look
at THIS row", the same tie-break discipline as everywhere else in the
engine). Complements `ext_snapshot_diff` (cross-snapshot drift) and
`ext_skew_audit` (distributional): this is the in-batch validity
check. NULL never passes a rule silently: predicates are evaluated
under ``coalesce(pred, false)`` on both engines, so a NULL status is a
violation of the domain rule, not a skipped row.

Scale (100 TB): ALL rules evaluate in a single scan — one aggregate
row carrying (violations, min bad key) per rule with map-side partial
aggregation, then an explode of that 1-row frame into the per-rule
report. No shuffle of data rows at all (the only exchange moves one
row per partition), no per-rule rescans; adding a rule adds two
columns to the partial aggregate, not a pass. The orderdate rule is
deliberately tighter than the fixture's range so the non-zero
violation path (count + reproducer key) is oracle-checked, not just
the all-green path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: rule name → (Spark predicate SQL, DuckDB predicate SQL). Kept as
#: parallel texts because the engines spell timestamps differently;
#: every pair must be semantically identical — the oracle hash check
#: is exactly the proof that they are.
RULES: dict[str, tuple[str, str]] = {
    "status_in_domain": (
        "o_orderstatus IN ('O', 'F', 'P')",
        "o_orderstatus IN ('O', 'F', 'P')",
    ),
    "priority_format": (
        "o_orderpriority RLIKE '^[1-5]-'",
        "regexp_matches(o_orderpriority, '^[1-5]-')",
    ),
    "custkey_not_null": ("o_custkey IS NOT NULL", "o_custkey IS NOT NULL"),
    "totalprice_positive": ("o_totalprice > 0", "o_totalprice > 0"),
    # tighter than the fixture's real range (dates run into 2001): this
    # rule HAS violations, proving the reporting path end to end
    "orderdate_before_y2k": (
        "o_orderdate < TIMESTAMP_NTZ '2000-01-01 00:00:00'",
        "o_orderdate < TIMESTAMP '2000-01-01 00:00:00'",
    ),
}

CONTRACT_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS rule,
       CAST(count(*) AS BIGINT) AS n_checked,
       CAST(count(*) FILTER (NOT coalesce({duck_pred}, false)) AS BIGINT)
         AS n_violations,
       CAST(min(o_orderkey) FILTER (NOT coalesce({duck_pred}, false)) AS BIGINT)
         AS first_bad_key
FROM orders"""
    for name, (_, duck_pred) in RULES.items()
)


@register("ext_contract_audit", oracle=CONTRACT_ORACLE)
def ext_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One report row per contract rule over orders: (rule, n_checked,
    n_violations, first_bad_key) — all rules in a single map-side
    aggregated scan."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_checked")]
    for name, (spark_pred, _) in RULES.items():
        bad = ~F.coalesce(F.expr(spark_pred), F.lit(False))
        aggs.append(
            F.sum(F.when(bad, 1).otherwise(0)).cast("bigint").alias(f"v_{name}")
        )
        aggs.append(
            F.min(F.when(bad, F.col("o_orderkey"))).cast("bigint").alias(f"k_{name}")
        )
    one = orders.agg(*aggs)
    report = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.col("n_checked"),
                    F.col(f"v_{name}").alias("n_violations"),
                    F.col(f"k_{name}").alias("first_bad_key"),
                )
                for name in RULES
            ]
        )
    ).alias("r")
    return one.select(report).select("r.*")
