"""Custom stateful operator (applyInPandasWithState sessionization):
multi-batch replay with arrival-closure, cross-batch state, ordinals,
and the event-time timeout flush, against hand-computed ground truth.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_spark_realtime_spark.streaming.sessionize import sessionize_stream

H = 3600 * 1000
M = 60 * 1000
T0 = 1_700_000_000_000  # arbitrary epoch-ms origin


def _write_batch(path, rows, order=0):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    # the file source picks oldest-modified first under maxFilesPerTrigger;
    # widely-spaced explicit mtimes make the replay order deterministic
    import os

    os.utime(path, (1_700_000_000 + order * 100, 1_700_000_000 + order * 100))


def test_sessionize_stream_multi_batch_with_timeout_flush(spark, tmp_path):
    src = tmp_path / "events"
    # batch 1: user 1 and user 2 each open a session of two events
    _write_batch(
        src / "00.jsonl",
        [
            {"user_id": 1, "ts_ms": T0},
            {"user_id": 1, "ts_ms": T0 + 5 * M},
            {"user_id": 2, "ts_ms": T0 + 1 * M},
            {"user_id": 2, "ts_ms": T0 + 6 * M},
        ],
    )
    # batch 2: user 1 returns after 2 h (closes session 1 by arrival,
    # opens session 2); user 3's lone event at T0+10h drags the
    # watermark far past every open session's last+gap, so user 2's
    # session 1 AND user 1's session 2 flush via event-time timeout.
    # user 3's own session stays open (watermark never passes it).
    _write_batch(
        src / "01.jsonl",
        [
            {"user_id": 1, "ts_ms": T0 + 2 * H},
            {"user_id": 3, "ts_ms": T0 + 10 * H},
        ],
        order=1,
    )

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts_ms", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("event_time", F.timestamp_millis("ts_ms"))
    )
    sessions = sessionize_stream(stream, watermark="30 minutes")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.user_id, r.session_id): (r.n_events, r.duration_ms)
        for r in spark.table("sess_out").collect()
    }
    expected = {
        (1, 1): (2, 5 * M),   # closed by user 1's return after the gap
        (1, 2): (1, 0),       # timeout flush (watermark = T0+10h-30m)
        (2, 1): (2, 5 * M),   # timeout flush
    }
    assert got == expected  # user 3's open session not emitted


def test_sessionize_stream_merges_in_gap_out_of_order(spark, tmp_path):
    src = tmp_path / "events"
    # batch 1 opens a session; batch 2 delivers an in-gap event that is
    # EARLIER than everything seen (late within the watermark): it must
    # merge into the open session and extend its start backwards.
    _write_batch(src / "00.jsonl", [{"user_id": 7, "ts_ms": T0 + 10 * M}])
    _write_batch(
        src / "01.jsonl",
        [
            {"user_id": 7, "ts_ms": T0},  # late, in gap
            {"user_id": 7, "ts_ms": T0 + 3 * H},  # closes the session
        ],
        order=1,
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts_ms", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("event_time", F.timestamp_millis("ts_ms"))
    )
    q = (
        sessionize_stream(stream, watermark="30 hours")
        .writeStream.format("memory")
        .queryName("sess_ooo")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.table("sess_ooo").collect()
    assert [(r.user_id, r.session_id, r.n_events, r.duration_ms) for r in rows] == [
        (7, 1, 2, 10 * M)
    ]
