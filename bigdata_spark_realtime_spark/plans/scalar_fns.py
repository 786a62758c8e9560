"""Scalar-function queries — SURVEY.md §2.4 (F1-F11).

Each query exercises one reference scalar function over the star schema,
built from the shared column/SQL pairs in ``functions.scalar`` so the
Spark side and the DuckDB oracle cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.functions import scalar as fns
from bigdata_spark_realtime_spark.plans.corpus import (  # noqa: F401 — re-exported
    AGE_REF_DATE,
    BIRTHDAY_SQL,
    birthday_col,
)
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# F1/F2 — epoch-ms → dt ('yyyy-MM-dd') + zero-padded hr ('HH') strings
# (`app/dwd_DauApp.scala:92,119,164-172`)
# ---------------------------------------------------------------------------

F1_ORACLE = f"""
SELECT event_id,
       epoch_ms(ts) AS ts_ms,
       {fns.dt_sql('ts')} AS dt,
       {fns.hr_sql('ts')} AS hr
FROM events
"""


@register("f1_f2_dt_hr_derive", oracle=F1_ORACLE)
def f1_f2_dt_hr_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        fns.dt_col("ts").alias("dt"),
        fns.hr_col("ts").alias("hr"),
    )


# ---------------------------------------------------------------------------
# F3 — datetime-string split → create_date / create_hour
# (`app/dwd_OrderApp.scala:140-147`: create_time.split(" ") then ":")
# ---------------------------------------------------------------------------

F3_ORACLE = """
SELECT o_orderkey,
       string_split(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), ' ')[1] AS create_date,
       string_split(string_split(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), ' ')[2], ':')[1] AS create_hour
FROM orders
"""


@register("f3_datetime_split", oracle=F3_ORACLE)
def f3_datetime_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-split date derivation, faithful to the reference (split on
    ' ' then ':'), not a date_format shortcut."""
    o = load_table(spark, sf_dir, "orders")
    dtstr = F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
    return o.select(
        "o_orderkey",
        F.split(dtstr, " ").getItem(0).alias("create_date"),
        F.split(F.split(dtstr, " ").getItem(1), ":").getItem(0).alias("create_hour"),
    )


# ---------------------------------------------------------------------------
# F4 — calendar-exact age (Period.between semantics,
# `app/dwd_DauApp.scala:136-141`). The star schema has no birthday column;
# the deterministic c_custkey derivation lives in plans/corpus.py so the
# join/agg/serving suites can share it without importing this module.
# ---------------------------------------------------------------------------

F4_ORACLE = f"""
SELECT c_custkey,
       CAST({BIRTHDAY_SQL} AS VARCHAR) AS birthday,
       {fns.age_years_sql(f'({BIRTHDAY_SQL})', f"DATE '{AGE_REF_DATE}'")} AS user_age
FROM customer
"""


@register("f4_age_derive", oracle=F4_ORACLE)
def f4_age_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    bday = birthday_col()
    ref = F.to_date(F.lit(AGE_REF_DATE))
    return c.select(
        "c_custkey",
        bday.cast("string").alias("birthday"),
        fns.age_years(bday, ref).alias("user_age"),
    )


# ---------------------------------------------------------------------------
# F5/F6 — string concat/interpolation + uppercase (Redis keys, topic and
# index names: `app/ods_BaseDBApp.scala:106,113`; `app/dwd_DauApp.scala:196`)
# ---------------------------------------------------------------------------

F5_ORACLE = """
SELECT p_partkey,
       'DIM:' || upper(p_brand) || ':' || CAST(p_partkey AS VARCHAR) AS dim_key,
       'gmall_part_info_' || p_type AS index_name
FROM part
"""


@register("f5_f6_key_naming", oracle=F5_ORACLE)
def f5_f6_key_naming(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(
            F.lit("DIM:"), F.upper("p_brand"), F.lit(":"), F.col("p_partkey").cast("string")
        ).alias("dim_key"),
        F.concat(F.lit("gmall_part_info_"), F.col("p_type")).alias("index_name"),
    )


# ---------------------------------------------------------------------------
# F7 — yesterday for day-over-day (`ia/PublisherMapperImpl.java:173-175`)
# ---------------------------------------------------------------------------

F7_ORACLE = """
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
       CAST(CAST(o_orderdate AS DATE) - 1 AS VARCHAR) AS order_date_yd
FROM orders
"""


@register("f7_yesterday", oracle=F7_ORACLE)
def f7_yesterday(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        d.cast("string").alias("order_date"),
        F.date_sub(d, 1).cast("string").alias("order_date_yd"),
    )


# ---------------------------------------------------------------------------
# F10 — ES match(field, item).operator(AND) emulation
# (`ia/PublisherMapperImpl.java:74-76,120-121`; contract per SURVEY §7.3)
# ---------------------------------------------------------------------------

MATCH_ITEM = "small widget"

F10_ORACLE = f"""
SELECT p_partkey, p_name
FROM part
WHERE {fns.match_all_tokens_sql('p_name', MATCH_ITEM)}
"""


@register("f10_match_and", oracle=F10_ORACLE)
def f10_match_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.where(fns.match_all_tokens(F.col("p_name"), MATCH_ITEM)).select(
        "p_partkey", "p_name"
    )


# ---------------------------------------------------------------------------
# F11 — highlight matched term with <em> tags
# (`ia/PublisherMapperImpl.java:127-144`)
# ---------------------------------------------------------------------------

HL_TERM = "widget"

F11_ORACLE = f"""
SELECT p_partkey, {fns.highlight_sql('p_name', HL_TERM)} AS sku_name
FROM part
WHERE contains(p_name, '{HL_TERM}')
"""


@register("f11_highlight", oracle=F11_ORACLE)
def f11_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.where(F.col("p_name").contains(HL_TERM)).select(
        "p_partkey", fns.highlight(F.col("p_name"), HL_TERM).alias("sku_name")
    )
