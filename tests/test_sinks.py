"""Effectively-once upsert sink (K5/D3/W4): idempotence + last-write-wins."""

from __future__ import annotations

from bigdata_spark_realtime_spark.streaming.sinks import upsert_parquet


def test_upsert_idempotent_and_last_write_wins(spark, tmp_path):
    path = str(tmp_path / "dau_table")
    b1 = spark.createDataFrame(
        [("m1", "2024-03-01", 100, "a"), ("m2", "2024-03-01", 110, "b")],
        "mid string, dt string, ts long, payload string",
    )
    upsert_parquet(spark, b1, path, ["dt", "mid"], "ts")
    # replay of the same batch (at-least-once delivery) → no duplicates
    upsert_parquet(spark, b1, path, ["dt", "mid"], "ts")
    assert spark.read.parquet(path).count() == 2

    # newer write for m1 wins; stale write for m2 loses
    b2 = spark.createDataFrame(
        [("m1", "2024-03-01", 200, "a2"), ("m2", "2024-03-01", 50, "stale")],
        "mid string, dt string, ts long, payload string",
    )
    upsert_parquet(spark, b2, path, ["dt", "mid"], "ts")
    rows = {r.mid: r for r in spark.read.parquet(path).collect()}
    assert len(rows) == 2
    assert rows["m1"].payload == "a2" and rows["m1"].ts == 200
    assert rows["m2"].payload == "b" and rows["m2"].ts == 110
