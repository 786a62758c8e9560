"""base_db CDC routing pipeline — ods_BaseDBApp re-expressed
(SURVEY.md §3.2 stages 2-4; reference `app/ods_BaseDBApp.scala`).

Maxwell envelopes → op normalization (T8) → set-membership routing (T9):
fact tables to per-table DWD topics (K4 dynamic topic column), dim
tables to the dim store keyed `DIM:{TABLE}:{id}` (K6).

The reference re-reads the routing lists from Redis every batch and
broadcasts them (`:67-81`); here the routing table is re-read inside
foreachBatch — same freshness, and the `isin` literal list broadcasts
implicitly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.schemas import CDC_SCHEMA

#: default routing lists (the reference seeds these in Redis:
#: `FACT:TABLES` / `DIM:TABLES`)
FACT_TABLES = ("order_info", "order_detail")
DIM_TABLES = ("user_info", "base_province")


def parse_cdc(raw: DataFrame) -> DataFrame:
    """value string → (op, table, data-json) with T8 normalization:
    bootstrap-insert→insert, insert/update/delete pass, else dropped."""
    parsed = raw.select(F.from_json("value", CDC_SCHEMA).alias("c")).select(
        F.col("c.type").alias("type"),
        F.col("c.table").alias("table"),
        F.col("c.data").alias("data"),
    )
    op = (
        F.when(F.col("type") == "bootstrap-insert", "insert")
        .when(F.col("type").isin("insert", "update", "delete"), F.col("type"))
        .otherwise("null")
    )
    return parsed.withColumn("op", op).where(F.col("op") != "null").drop("type")


def route_facts(cdc: DataFrame, fact_tables: Sequence[str] = FACT_TABLES) -> DataFrame:
    """Fact branch → rows carrying their dynamic Kafka topic
    `DWD_{TABLE}_{OP}` (K4: with a `topic` column the Kafka sink routes
    per record natively)."""
    return cdc.where(F.col("table").isin(*fact_tables)).select(
        F.concat(
            F.lit("DWD_"), F.upper("table"), F.lit("_"), F.upper("op")
        ).alias("topic"),
        F.col("data").alias("value"),
        "table",
        "op",
    )


def route_dims(cdc: DataFrame, dim_tables: Sequence[str] = DIM_TABLES) -> DataFrame:
    """Dim branch → upsert rows keyed `DIM:{TABLE}:{id}` (K6)."""
    return cdc.where(F.col("table").isin(*dim_tables)).select(
        F.concat(
            F.lit("DIM:"),
            F.upper("table"),
            F.lit(":"),
            F.get_json_object("data", "$.id"),
        ).alias("key"),
        F.col("data").alias("value"),
        "table",
    )
