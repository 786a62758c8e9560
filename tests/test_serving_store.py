"""dt-partitioned serving store: the ES index-per-day replacement (K5).

Partition pruning on the dt predicate + day-scoped merges.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.streaming.sinks import upsert_parquet


def _df(spark, rows):
    return spark.createDataFrame(rows, "mid string, dt string, ts long, v string")


def test_partitioned_upsert_and_pruning(spark, tmp_path):
    path = str(tmp_path / "dau_store")
    upsert_parquet(
        spark,
        _df(spark, [("m1", "2024-03-01", 1, "a"), ("m2", "2024-03-02", 2, "b")]),
        path, ["dt", "mid"], "ts", partition_by="dt",
    )
    parts = sorted(d for d in os.listdir(path) if d.startswith("dt="))
    assert parts == ["dt=2024-03-01", "dt=2024-03-02"]

    # day-scoped upsert: only 03-02 is rewritten, 03-01 rows survive
    upsert_parquet(
        spark,
        _df(spark, [("m2", "2024-03-02", 9, "b2"), ("m3", "2024-03-02", 3, "c")]),
        path, ["dt", "mid"], "ts", partition_by="dt",
    )
    rows = {(r.mid, r.dt): (r.ts, r.v) for r in spark.read.parquet(path).collect()}
    assert rows == {
        ("m1", "2024-03-01"): (1, "a"),
        ("m2", "2024-03-02"): (9, "b2"),
        ("m3", "2024-03-02"): (3, "c"),
    }

    # serving query with dt predicate prunes to one partition
    q = spark.read.parquet(path).where(F.col("dt") == "2024-03-01")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2024-03-01" in plan
    assert q.count() == 1


def test_compact_partition_preserves_rows_and_shrinks_files(spark, tmp_path):
    from pyspark.sql import functions as F

    from bigdata_spark_realtime_spark.streaming.sinks import (
        compact_partition,
        upsert_parquet,
    )

    path = str(tmp_path / "dau")
    # simulate many micro-batch upserts -> many small files in one day
    for batch in range(6):
        df = spark.range(batch * 10, batch * 10 + 10).select(
            F.col("id").alias("mid"),
            F.lit("2024-03-01").alias("dt"),
            F.col("id").alias("ts"),
        ).repartition(4)
        upsert_parquet(spark, df, path, ["dt", "mid"], "ts", partition_by="dt")
    part_dir = tmp_path / "dau" / "dt=2024-03-01"
    before = spark.read.option("basePath", path).parquet(str(part_dir)).collect()

    n_files = compact_partition(spark, path, "dt", "2024-03-01", target_files=1)
    assert n_files == 1
    after = spark.read.option("basePath", path).parquet(str(part_dir)).collect()
    assert sorted((r.mid, r.ts) for r in after) == sorted(
        (r.mid, r.ts) for r in before
    )
    # compacting a missing partition is a no-op
    assert compact_partition(spark, path, "dt", "1999-01-01") == 0
