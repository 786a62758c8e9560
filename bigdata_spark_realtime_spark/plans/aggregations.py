"""Aggregation operators — SURVEY.md §2.7 (A1-A6).

The reference pushes every aggregation to Elasticsearch terms/sum aggs
(`ia/PublisherMapperImpl.java:64-239`); here they run natively as
partial+final hash aggregations. ES bucket semantics (order by doc count
desc, size-capped) are reproduced with ORDER BY count DESC + tiebreak +
LIMIT so results are deterministic (SURVEY §7.3 risk list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.functions import scalar as fns
from bigdata_spark_realtime_spark.plans.corpus import (
    AGE_REF_DATE,
    BIRTHDAY_SQL,
    GENDER_SQL,
    birthday_col,
    gender_col,
)
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: the dashboard's "today" over the events fixture (2024-01-01..30)
TD = "2024-01-06"

# ---------------------------------------------------------------------------
# A1 — ungrouped COUNT(*) with a date predicate (DAU total,
# `ia/PublisherMapperImpl.java:219-239`)
# ---------------------------------------------------------------------------

A1_ORACLE = f"""
SELECT count(*) AS dau_total
FROM events
WHERE {fns.dt_sql('ts')} = '{TD}'
"""


@register("a1_count_total", oracle=A1_ORACLE)
def a1_count_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.where(fns.dt_col("ts") == TD).agg(F.count(F.lit(1)).alias("dau_total"))


# ---------------------------------------------------------------------------
# A2/L5 — GROUP BY hour + COUNT, ES-terms-agg ordering: buckets by doc
# count desc (tie: key asc), size 24 (`ia/PublisherMapperImpl.java:181-218`)
# ---------------------------------------------------------------------------

A2_ORACLE = f"""
SELECT {fns.hr_sql('ts')} AS hr, count(*) AS ct
FROM events
WHERE {fns.dt_sql('ts')} = '{TD}'
GROUP BY 1
ORDER BY ct DESC, hr
LIMIT 24
"""


@register("a2_hourly_counts_topk", oracle=A2_ORACLE)
def a2_hourly_counts_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(fns.dt_col("ts") == TD)
        .groupBy(fns.hr_col("ts").alias("hr"))
        .agg(F.count(F.lit(1)).alias("ct"))
        .orderBy(F.desc("ct"), "hr")
        .limit(24)
    )


# ---------------------------------------------------------------------------
# A3 — day-over-day composite: today's + yesterday's hourly counts in one
# result (`ia/PublisherMapperImpl.java:163-179`)
# ---------------------------------------------------------------------------

A3_ORACLE = f"""
SELECT 'td' AS kind, {fns.hr_sql('ts')} AS hr, count(*) AS ct
FROM events WHERE {fns.dt_sql('ts')} = '{TD}' GROUP BY 2
UNION ALL
SELECT 'yd' AS kind, {fns.hr_sql('ts')} AS hr, count(*) AS ct
FROM events WHERE {fns.dt_sql('ts')} = CAST(DATE '{TD}' - 1 AS VARCHAR) GROUP BY 2
"""


@register("a3_day_over_day", oracle=A3_ORACLE)
def a3_day_over_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # yesterday resolved literally (deterministic, no current_date — F7)
    import datetime

    yd_str = (datetime.date.fromisoformat(TD) - datetime.timedelta(days=1)).isoformat()
    # r15 optimization: ONE scan + one (kind, hr) aggregation — the
    # per-day union form scanned events twice; the two day filters are
    # disjoint, so a CASE label over the combined filter yields the
    # identical row multiset
    dt = fns.dt_col("ts")
    return (
        ev.where(dt.isin(TD, yd_str))
        .groupBy(
            F.when(dt == TD, "td").otherwise("yd").alias("kind"),
            fns.hr_col("ts").alias("hr"),
        )
        .agg(F.count(F.lit(1)).alias("ct"))
    )


# ---------------------------------------------------------------------------
# A4 — filtered GROUP BY + SUM, top-100 groups by doc count
# (`ia/PublisherMapperImpl.java:64-109`: match(sku_name, item, AND) →
# terms(field, 100) → sum(split_total_amount))
# ---------------------------------------------------------------------------

A4_ITEM = "widget"

A4_ORACLE = f"""
SELECT p.p_brand AS grp,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS amount,
       count(*) AS ct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE {fns.match_all_tokens_sql('p.p_name', A4_ITEM)}
GROUP BY 1
ORDER BY ct DESC, grp
LIMIT 100
"""


@register("a4_stats_by_item_top100", oracle=A4_ORACLE)
def a4_stats_by_item_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        fns.match_all_tokens(F.col("p_name"), A4_ITEM)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("grp"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "amount"
            ),
            F.count(F.lit(1)).alias("ct"),
        )
        .orderBy(F.desc("ct"), "grp")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# A5 — post-agg re-bucketing: fine-grained age groups re-aggregated into 3
# range buckets (`ia/publisherServiceImpl.java:57-78`). Done as one
# two-level aggregation (inner by age, outer by bucket) to mirror the
# client-side second pass.
# ---------------------------------------------------------------------------

A5_ORACLE = f"""
SELECT {fns.age_bucket_sql('user_age')} AS age_group,
       round(sum(amount), 2) AS amount
FROM (
  SELECT {fns.age_years_sql(f'({BIRTHDAY_SQL})', f"DATE '{AGE_REF_DATE}'")} AS user_age,
         sum(c_acctbal) AS amount
  FROM customer
  GROUP BY 1
)
GROUP BY 1
"""


@register("a5_age_rebucket", oracle=A5_ORACLE)
def a5_age_rebucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    age = fns.age_years(birthday_col(), F.to_date(F.lit(AGE_REF_DATE)))
    inner = c.groupBy(age.alias("user_age")).agg(F.sum("c_acctbal").alias("amount"))
    return inner.groupBy(
        fns.age_bucket(F.col("user_age")).alias("age_group")
    ).agg(F.round(F.sum("amount"), 2).alias("amount"))


# ---------------------------------------------------------------------------
# A6 — relabel + passthrough: gender decode applied over an aggregate
# (`ia/publisherServiceImpl.java:44-56`)
# ---------------------------------------------------------------------------

A6_ORACLE = f"""
SELECT {fns.gender_decode_sql('gender')} AS gender_label,
       round(sum(amount), 2) AS amount, CAST(sum(ct) AS BIGINT) AS ct
FROM (
  SELECT {GENDER_SQL} AS gender, sum(c_acctbal) AS amount, count(*) AS ct
  FROM customer GROUP BY 1
)
GROUP BY 1
"""


@register("a6_gender_relabel", oracle=A6_ORACLE)
def a6_gender_relabel(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    inner = c.groupBy(gender_col().alias("gender")).agg(
        F.sum("c_acctbal").alias("amount"), F.count(F.lit(1)).alias("ct")
    )
    return inner.groupBy(
        fns.gender_decode(F.col("gender")).alias("gender_label")
    ).agg(F.round(F.sum("amount"), 2).alias("amount"), F.sum("ct").alias("ct"))
