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
    partition_by: str | None = None,
) -> None:
    """Idempotent keyed upsert: replayed batches overwrite instead of
    duplicating (doc-id semantics). Winner per key = max(seq_col),
    ties broken by latest write (batch rows win over existing).

    ``partition_by`` (typically 'dt') replicates the reference's
    index-per-day layout (`gmall_dau_info_$date`) as hive partitions:
    serving queries with a dt predicate scan only their day, and the
    merge itself touches only the partitions present in the batch —
    at 100 TB the rewrite cost is one day, not the table.
    """
    batch = batch_df.withColumn("__src", F.lit(1))
    if partition_by and os.path.exists(path):
        days = [r[0] for r in batch_df.select(partition_by).distinct().collect()]
        existing = (
            spark.read.option("basePath", path)
            .parquet(*[f"{path}/{partition_by}={d}" for d in days if
                       os.path.exists(f"{path}/{partition_by}={d}")])
            .withColumn("__src", F.lit(0))
            if any(os.path.exists(f"{path}/{partition_by}={d}") for d in days)
            else None
        )
        merged = existing.unionByName(batch) if existing is not None else batch
    elif os.path.exists(path):
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
    if partition_by and os.path.exists(path):
        # dynamic partition overwrite: only the batch's days are replaced.
        # Writer-level option, NOT a session conf set — a shared session
        # must not keep 'dynamic' after the upsert returns (it silently
        # changes every later overwrite-write's semantics).
        (
            result.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_by)
            .parquet(path)
        )
        return
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    writer = result.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


def foreach_batch_upsert(
    spark: SparkSession,
    path: str,
    key_cols: Sequence[str],
    seq_col: str,
    partition_by: str | None = None,
):
    """foreachBatch hook: ``stream.writeStream.foreachBatch(this)``."""

    def _inner(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_parquet(spark, batch_df, path, key_cols, seq_col, partition_by)

    return _inner


def compact_partition(
    spark: SparkSession,
    path: str,
    partition_by: str,
    value: str,
    target_files: int = 1,
) -> int:
    """Compact one hive partition's small files into ``target_files``.

    A 5 s-trigger upsert stream writes a few files per micro-batch; a
    day of streaming leaves thousands of small files that degrade every
    serving scan (footer/open cost dominates). Compaction is the
    amortizing counterpart: rewrite ONE day's directory — never the
    table — into scan-sized files, write-aside-and-swap. New listings
    never see both copies or a half-written partition; an in-flight
    read that listed the old files before the swap can fail with a
    vanished-file error and must retry (plain parquet has no
    transaction log — on a real cluster use Delta/Iceberg rewrites for
    reader-transparent compaction).

    Returns the number of data files after compaction. Run it on closed
    (previous-day) partitions from any scheduler; concurrent upserts to
    OTHER partitions are unaffected since only this directory moves.
    """
    part_dir = os.path.join(path, f"{partition_by}={value}")
    if not os.path.exists(part_dir):
        return 0
    df = spark.read.parquet(part_dir)
    # temp dirs live BESIDE the table root, never inside it: a
    # `dt=X.compact-*` sibling inside the root is visible to partition
    # discovery on the table path and can double-count the day mid-swap.
    # The only in-root mutation is the rename pair below.
    tmp = f"{path}.compact-{uuid.uuid4().hex[:8]}"
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    old = f"{path}.old-{uuid.uuid4().hex[:8]}"
    os.rename(part_dir, old)
    os.rename(tmp, part_dir)
    shutil.rmtree(old)
    return len([f for f in os.listdir(part_dir) if f.endswith(".parquet")])
