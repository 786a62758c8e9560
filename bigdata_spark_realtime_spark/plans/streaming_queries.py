"""Streaming operators surfaced in the driver correctness gate.

Each query here actually executes a Structured Streaming dataflow
(readStream → stateful op → memory sink, drained synchronously) and
returns the sink table. `stream_dedup_dau_keys` is oracle-checked: the
deduped (dt, user) key set is deterministic regardless of intra-batch
arrival order, so it hash-matches SELECT DISTINCT. The pipeline entries
over generated Group-2 fixtures are rows-only (their full semantics are
asserted in tests/test_streaming_pipelines.py with pure-python ground
truths).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.functions import scalar as fns
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.streaming.dau import DEDUP_WATERMARK


def _drain_to_memory(df: DataFrame, spark: SparkSession) -> DataFrame:
    name = f"q_{uuid.uuid4().hex[:10]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the driver's events table as a file-source stream (`ts`
    surfaces as a nanos long under the legacy conf; the file-stream
    source requires a directory, so the single parquet file is exposed
    through a symlinked dir)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema  # ts read as long (nanos)
    stream_dir = os.path.join(
        tempfile.gettempdir(), f"bsr_events_{os.path.basename(os.path.dirname(path))}"
    )
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(path, link)
    return spark.readStream.schema(schema).parquet(stream_dir)


STREAM_DEDUP_ORACLE = f"""
SELECT DISTINCT {fns.dt_sql('ts')} AS dt, user_id FROM events
"""


@register("stream_dedup_dau_keys", oracle=STREAM_DEDUP_ORACLE)
def stream_dedup_dau_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 as a real streaming op: events replayed through
    dropDuplicatesWithinWatermark keyed by (event-date, user) — the
    DAU dedup state machine — then projected to its deterministic key
    set."""
    stream = _events_stream(spark, sf_dir)
    deduped = (
        stream.withColumn("event_time", F.expr("timestamp_micros(ts div 1000)"))
        .withColumn("dt", fns.dt_col("event_time"))
        .withWatermark("event_time", DEDUP_WATERMARK)
        .dropDuplicatesWithinWatermark(["dt", "user_id"])
        .select("dt", "user_id")
    )
    return _drain_to_memory(deduped, spark)


@register("stream_order_wide_join")
def stream_order_wide_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/J5 as a real streaming op: Group-2 order streams (generated
    fixtures — the driver tables have no dual-stream shape) joined
    stream-stream with 24 h TTL watermarks. Rows-only in the gate;
    exact-pair semantics asserted in tests."""
    from pyspark.sql import types as T

    from bigdata_spark_realtime_spark import schemas as S
    from bigdata_spark_realtime_spark.sources import fixtures as FX
    from bigdata_spark_realtime_spark.streaming.order import (
        enrich_order_info,
        order_wide_join,
    )

    base = os.path.join(tempfile.gettempdir(), "bsr_stream_fixtures")
    if not os.path.exists(os.path.join(base, "orders")):
        FX.gen_order_streams(os.path.join(base, "orders"), n_orders=150, n_files=3)
        FX.gen_dims(os.path.join(base, "dims"))

    dim_user = spark.read.schema(S.DIM_USER_SCHEMA).json(
        os.path.join(base, "dims", "user_info")
    )
    dim_prov = spark.read.schema(S.DIM_PROVINCE_SCHEMA).json(
        os.path.join(base, "dims", "base_province")
    )
    info_schema = T.StructType(
        S.ORDER_INFO_SCHEMA.fields + [T.StructField("event_ts", T.LongType())]
    )
    det_schema = T.StructType(
        S.ORDER_DETAIL_SCHEMA.fields + [T.StructField("event_ts", T.LongType())]
    )
    info = spark.readStream.schema(info_schema).json(
        os.path.join(base, "orders", "order_info")
    )
    det = spark.readStream.schema(det_schema).json(
        os.path.join(base, "orders", "order_detail")
    )
    wide = order_wide_join(
        enrich_order_info(info, dim_user, dim_prov), det, streaming=True
    )
    return _drain_to_memory(wide, spark)


@register("stream_base_log_split")
def stream_base_log_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 multiplex as a real streaming op over the generated raw-log
    fixture: the page branch of the 1→5 split. Rows-only in the gate;
    branch-exact counts asserted in tests."""
    from bigdata_spark_realtime_spark.sources import fixtures as FX
    from bigdata_spark_realtime_spark.streaming.base_log import split_base_log

    base = os.path.join(tempfile.gettempdir(), "bsr_stream_fixtures")
    raw_dir = os.path.join(base, "raw_log")
    if not os.path.exists(raw_dir):
        FX.gen_raw_log(raw_dir, n_rows=800, n_files=2)
    raw = spark.readStream.format("text").load(raw_dir)
    return _drain_to_memory(split_base_log(raw)["page"], spark)


# ---------------------------------------------------------------------------
# custom stateful operator (applyInPandasWithState)
# ---------------------------------------------------------------------------

_GAP_MS = 30 * 60 * 1000

#: sessions closed by a subsequent event (the operator run below uses a
#: watermark far larger than the fixture's time span, so timeout flushes
#: never fire and the emitted set is exactly "every session except each
#: user's final open one" — SQL-expressible, hence oracle-checked even
#: though the operator itself is custom stateful code)
STREAM_SESSIONIZE_ORACLE = f"""
WITH sess AS (
  SELECT user_id, session_id,
         count(*) AS n_events,
         max(epoch_ms(ts)) - min(epoch_ms(ts)) AS duration_ms
  FROM (
    SELECT user_id, ts,
           CAST(sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                   OR epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id
                                                            ORDER BY ts, event_id))
                      > {_GAP_MS}
                  THEN 1 ELSE 0 END AS is_new_session
      FROM events
    )
  )
  GROUP BY 1, 2
)
SELECT user_id, session_id, n_events, duration_ms
FROM (SELECT *, max(session_id) OVER (PARTITION BY user_id) AS max_sid FROM sess)
WHERE session_id < max_sid
"""


@register("stream_sessionize_gap", oracle=STREAM_SESSIONIZE_ORACLE)
def stream_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator: per-user gap sessionization
    with session ordinals via applyInPandasWithState
    (streaming/sessionize.py). Oracle covers the arrival-closed
    sessions; the timeout-flush path is exercised in tests."""
    from bigdata_spark_realtime_spark.streaming.sessionize import sessionize_stream

    stream = _events_stream(spark, sf_dir).withColumn(
        "event_time", F.expr("timestamp_micros(ts div 1000)")
    )
    # watermark >> fixture span: timeout flushes suppressed for a
    # deterministic, oracle-checkable emitted set
    sessions = sessionize_stream(stream, watermark="3650 days")
    return _drain_to_memory(sessions, spark)


@register("stream_order_outer_orphans")
def stream_order_outer_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The left-outer stream-stream join's orphan channel as a real
    streaming op: details with no header inside the ±24 h TTL emit
    exactly once with null header columns after far-future sentinel
    rows push the watermark past every real row's horizon (same
    technique as the replay test). Rows-only in the gate — fixture
    content and watermark math are deterministic, so the orphan count
    is stable; exact orphan-set semantics are asserted in
    tests/test_streaming_pipelines.py."""
    import json as _json
    import shutil

    from pyspark.sql import types as T

    from bigdata_spark_realtime_spark import schemas as S
    from bigdata_spark_realtime_spark.sources import fixtures as FX
    from bigdata_spark_realtime_spark.streaming.order import (
        enrich_order_info,
        order_wide_join,
    )

    base = os.path.join(tempfile.gettempdir(), "bsr_stream_fixtures")
    if not os.path.exists(os.path.join(base, "orders")):
        FX.gen_order_streams(os.path.join(base, "orders"), n_orders=150, n_files=3)
        FX.gen_dims(os.path.join(base, "dims"))
    work = os.path.join(base, "orders_outer")
    if os.path.exists(work):
        shutil.rmtree(work)
    shutil.copytree(os.path.join(base, "orders"), work)

    rows = []
    for fn in os.listdir(os.path.join(work, "order_info")):
        with open(os.path.join(work, "order_info", fn)) as f:
            rows += [_json.loads(x) for x in f if x.strip()]
    for fn in os.listdir(os.path.join(work, "order_detail")):
        with open(os.path.join(work, "order_detail", fn)) as f:
            rows += [_json.loads(x) for x in f if x.strip()]
    max_ts = max(r["event_ts"] for r in rows)
    for k, bump in ((1, 60), (2, 120)):
        flush = max_ts + bump * 3600_000
        with open(os.path.join(work, "order_info", f"zz_flush_{k}.json"), "w") as f:
            f.write(_json.dumps({"id": -100 - k, "user_id": 1, "province_id": 1,
                                 "create_time": "2030-01-01 00:00:00",
                                 "event_ts": flush}) + "\n")
        with open(os.path.join(work, "order_detail", f"zz_flush_{k}.json"), "w") as f:
            f.write(_json.dumps({"id": -200 - k, "order_id": -999, "sku_id": 1,
                                 "create_time": "2030-01-01 00:00:00",
                                 "event_ts": flush}) + "\n")

    dim_user = spark.read.schema(S.DIM_USER_SCHEMA).json(
        os.path.join(base, "dims", "user_info")
    )
    dim_prov = spark.read.schema(S.DIM_PROVINCE_SCHEMA).json(
        os.path.join(base, "dims", "base_province")
    )
    info_schema = T.StructType(
        S.ORDER_INFO_SCHEMA.fields + [T.StructField("event_ts", T.LongType())]
    )
    det_schema = T.StructType(
        S.ORDER_DETAIL_SCHEMA.fields + [T.StructField("event_ts", T.LongType())]
    )
    info = spark.readStream.schema(info_schema).option("maxFilesPerTrigger", 2).json(
        os.path.join(work, "order_info")
    )
    det = spark.readStream.schema(det_schema).option("maxFilesPerTrigger", 2).json(
        os.path.join(work, "order_detail")
    )
    wide = order_wide_join(
        enrich_order_info(info, dim_user, dim_prov), det,
        streaming=True, how="left_outer",
    )
    drained = _drain_to_memory(wide, spark)
    return (
        drained.where(F.col("detail_id") > 0)
        .where(F.col("order_id").isNull())
        .select("detail_id", "sku_name", "split_total_amount")
    )
