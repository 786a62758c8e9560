"""Effectively-once upsert sink (K5/D3/W4): idempotence + last-write-wins,
session-conf hygiene, and compaction atomicity under concurrent readers."""

from __future__ import annotations

import os
import threading

from bigdata_spark_realtime_spark.streaming.sinks import (
    compact_partition,
    upsert_parquet,
)


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


def test_partitioned_upsert_does_not_leak_session_conf(spark, tmp_path):
    """The dynamic-partition-overwrite mode must be a writer-level option:
    a shared session left on 'dynamic' silently changes the semantics of
    every later overwrite write."""
    key = "spark.sql.sources.partitionOverwriteMode"
    before = spark.conf.get(key)
    path = str(tmp_path / "dau_by_day")
    b = spark.createDataFrame(
        [("m1", "2024-03-01", 100, "a"), ("m2", "2024-03-02", 110, "b")],
        "mid string, dt string, ts long, payload string",
    )
    upsert_parquet(spark, b, path, ["dt", "mid"], "ts", partition_by="dt")
    # second call takes the os.path.exists(path) branch that used to
    # flip the session conf
    b2 = spark.createDataFrame(
        [("m1", "2024-03-01", 200, "a2")], "mid string, dt string, ts long, payload string"
    )
    upsert_parquet(spark, b2, path, ["dt", "mid"], "ts", partition_by="dt")
    assert spark.conf.get(key) == before
    # and the merge itself only replaced the batch's day
    rows = {r.mid: r.payload for r in spark.read.parquet(path).collect()}
    assert rows == {"m1": "a2", "m2": "b"}


def test_compact_keeps_temp_dirs_outside_table_root(spark, tmp_path):
    path = str(tmp_path / "store")
    b = spark.createDataFrame(
        [(f"m{i}", "2024-03-01", i, "x") for i in range(20)]
        + [(f"m{i}", "2024-03-02", i, "y") for i in range(20)],
        "mid string, dt string, ts long, payload string",
    )
    b.repartition(8).write.partitionBy("dt").parquet(path)
    seen_in_root: set[str] = set()
    stop = threading.Event()

    def watch_root():
        while not stop.is_set():
            seen_in_root.update(
                e for e in os.listdir(path) if not e.startswith("dt=") and
                not e.startswith("_") and not e.startswith(".")
            )

    t = threading.Thread(target=watch_root)
    t.start()
    try:
        n = compact_partition(spark, path, "dt", "2024-03-01", target_files=1)
    finally:
        stop.set()
        t.join()
    assert n == 1
    assert seen_in_root == set(), f"temp entries leaked into table root: {seen_in_root}"
    assert spark.read.parquet(path).count() == 40


def test_concurrent_reads_never_double_count_during_compaction(spark, tmp_path):
    path = str(tmp_path / "store2")
    b = spark.createDataFrame(
        [(f"m{i}", "2024-03-01", i, "x") for i in range(30)]
        + [(f"m{i}", "2024-03-02", i, "y") for i in range(10)],
        "mid string, dt string, ts long, payload string",
    )
    b.repartition(6).write.partitionBy("dt").parquet(path)
    errors: list[Exception] = []
    counts: list[int] = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                counts.append(spark.read.parquet(path).count())
            except Exception as e:  # a vanished-mid-swap dir is a failure
                errors.append(e)

    t = threading.Thread(target=reader)
    t.start()
    try:
        for _ in range(3):
            compact_partition(spark, path, "dt", "2024-03-01", target_files=1)
    finally:
        stop.set()
        t.join()
    # Plain parquet has no transaction log: an in-flight read that listed
    # the old files before the swap may fail with a vanished-file error
    # and must retry. What the swap DOES guarantee: no reader ever sees
    # both copies (double-count) or a half-written partition.
    for e in errors:
        msg = str(e)
        assert any(s in msg for s in ("FileNotFound", "does not exist", "PATH_NOT_FOUND")), msg
    assert set(counts) <= {40, 10}, sorted(set(counts))
    assert spark.read.parquet(path).count() == 40
