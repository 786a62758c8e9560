"""Bucketed (pre-shuffled) tables for co-located, exchange-free joins.

The 100 TB story: orders⋈lineitem on the order key is the one
unavoidable big-fact shuffle in this schema (README "shuffle inventory").
Bucketing both facts by the join key at write time moves that shuffle
from every query to once at ingest — every subsequent join, agg, or
MERGE keyed on the order key reads co-located buckets and skips the
Exchange entirely. This is the batch analogue of the streaming
pipelines' "reuse one partitioning across stages" rule.

Spark specifics: ``bucketBy`` requires ``saveAsTable`` (bucket metadata
lives in the catalog, not the parquet footer). Tables are written as
EXTERNAL (explicit ``path``) so the data directory is reusable and
droppable without touching the warehouse dir; in-memory-catalog sessions
re-register the same files instead of rewriting them.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from bigdata_spark_realtime_spark.sources.tables import load_table

DEFAULT_BUCKETS = 8
DEFAULT_ROOT = "/tmp/bigdata_spark_realtime_bucketed"

#: fact → bucket key (the stream-stream / order-analytics join key)
BUCKET_KEYS = {"orders": "o_orderkey", "lineitem": "l_orderkey"}


def _tag(sf_dir: str) -> str:
    return re.sub(r"[^A-Za-z0-9]+", "_", sf_dir).strip("_")


def bucketed_table_name(sf_dir: str, table: str, n_buckets: int) -> str:
    return f"bkt_{_tag(sf_dir)}_{table}_{n_buckets}"


def materialize_bucketed(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    n_buckets: int = DEFAULT_BUCKETS,
    root: str = DEFAULT_ROOT,
) -> DataFrame:
    """Write (once) and return ``table`` bucketed+sorted by its join key.

    Idempotent per (sf_dir, table, n_buckets): if the catalog already
    has the table this session, reuse it; if only the files exist (a
    previous session wrote them), re-register the external table over
    the same path — no rewrite.
    """
    key = BUCKET_KEYS[table]
    name = bucketed_table_name(sf_dir, table, n_buckets)
    if spark.catalog.tableExists(name):
        return spark.table(name)
    path = os.path.join(root, name)
    marker = os.path.join(path, "_SUCCESS")
    writer = (
        load_table(spark, sf_dir, table)
        .write.bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
    )
    if os.path.exists(marker):
        # files are there from an earlier session: register, don't rewrite
        # (bucketing DDL requires the explicit column list)
        schema = load_table(spark, sf_dir, table).schema
        cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
        spark.sql(
            f"CREATE TABLE {name} ({cols}) USING parquet "
            f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {n_buckets} BUCKETS "
            f"LOCATION '{path}'"
        )
    else:
        writer.mode("overwrite").saveAsTable(name)
    return spark.table(name)


def colocated_order_join(
    spark: SparkSession, sf_dir: str, n_buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """orders⋈lineitem with both sides bucketed by the order key: the
    merge-hinted sort-merge join reads matching buckets directly —
    ``explain`` shows zero Exchange below the join (asserted in
    tests/test_bucketing.py)."""
    o = materialize_bucketed(spark, sf_dir, "orders", n_buckets)
    li = materialize_bucketed(spark, sf_dir, "lineitem", n_buckets)
    return li.hint("merge").join(o, li.l_orderkey == o.o_orderkey)
