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
