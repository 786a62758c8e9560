"""Batch table sources over the driver-generated parquet star schema.

The reference's sources are Kafka topics + Redis dim KV (SURVEY.md §2.1
S1-S5); for batch queries and the DuckDB-oracle correctness gate the
engine reads the same logical tables from parquet. Parquet scans get
predicate pushdown + column pruning from Catalyst for free — the
reference had to hand-code both (`ia/PublisherMapperImpl.java:117-118`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the ten driver-generated tables (TESTDATA.md / FIXTURES.md Group 1)
TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_session_confs(spark: SparkSession) -> None:
    """Pin the runtime-settable confs every query depends on, so results
    are correct even under a SparkSession the engine didn't build (the
    driver's verify harness creates its own): UTC for all date/hour
    derivations (F1-F3), string partition values for dt-partitioned
    serving tables."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores `ts` as TIMESTAMP(NANOS), which the Spark
    parquet reader rejects outright ([PARQUET_TYPE_ILLEGAL]). Read nanos
    as long (legacy conf, runtime-settable) and truncate to microseconds
    with exact integer division — the same ns→µs truncation DuckDB
    applies, so both engines see identical timestamps."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """All tables as a dict, or — when ``names`` are given — exactly
    those tables as a tuple (``li, s = load_tables(spark, d, "lineitem",
    "supplier")``)."""
    if names:
        return tuple(load_table(spark, sf_dir, n) for n in names)
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view so plans can use spark.sql."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
