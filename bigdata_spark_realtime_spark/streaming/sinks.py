"""Sinks: the effectively-once keyed-upsert writer (K5/D3/W4).

The reference achieves effectively-once by bulk-writing to ES with an
explicit doc id (last write wins) after at-least-once delivery
(`util/MyEsUtils.scala:42-52`, `app/dwd_DauApp.scala:186-203`). The
Spark twin is a foreachBatch MERGE keyed by the same id on top of
checkpointed offsets.

This container has no Delta/Iceberg jars (TESTDATA env), so MERGE is
emulated: union existing+batch → window last-write-wins → atomic
directory swap. On a real cluster swap `upsert_parquet` for
``DeltaTable.merge`` — call sites don't change.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def upsert_parquet(
    spark: SparkSession,
    batch_df: DataFrame,
    path: str,
    key_cols: Sequence[str],
    seq_col: str,
) -> None:
    """Idempotent keyed upsert: replayed batches overwrite instead of
    duplicating (doc-id semantics). Winner per key = max(seq_col),
    ties broken by latest write (batch rows win over existing)."""
    batch = batch_df.withColumn("__src", F.lit(1))
    if os.path.exists(path):
        existing = spark.read.parquet(path).withColumn("__src", F.lit(0))
        merged = existing.unionByName(batch)
    else:
        merged = batch
    w = Window.partitionBy(*key_cols).orderBy(F.desc(seq_col), F.desc("__src"))
    result = (
        merged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    result.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


def foreach_batch_upsert(
    spark: SparkSession, path: str, key_cols: Sequence[str], seq_col: str
):
    """foreachBatch hook: ``stream.writeStream.foreachBatch(this)``."""

    def _inner(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_parquet(spark, batch_df, path, key_cols, seq_col)

    return _inner
