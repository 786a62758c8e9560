"""Tail-registration shim: round-13 streaming intake twins.

Two more continuous-intake twins extending the multimodal and packing
families (the reference's intake pattern — `app/ods_BaseLogApp.scala`
reads raw Kafka and forks typed downstream topics; here the "topics"
are media clips and curated documents):

* ``stream_scene_cuts`` — the video-segmentation intake shape: clips
  arrive as opaque binary payloads, every micro-batch runs the Arrow
  container-parse + per-frame integer-luma kernel in-stream (stateless
  map, pixels never leave the task), and the cut detection runs on the
  drained frame-stats rows.
* ``stream_pack_shards`` — the pre-training packing intake shape:
  documents arrive continuously, the hash-shard assignment (the only
  corpus-wide map) runs in-stream, and the per-shard greedy packing
  runs on the drained shard state.

Defined at the end of the registry walk to respect the pinned gate
window's splice rule; both enter PENDING_FIRST_DRIVER_ROW and seat in
the R14 refresh window.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.functions import hashing as H
from bigdata_spark_realtime_spark.plans.ext_multimodal import (
    SCENE_CUT_THRESHOLD,
    SCENE_CUTS_ORACLE,
    ensure_media_fixtures,
)
from bigdata_spark_realtime_spark.plans.ext_packing import (
    N_SHARDS,
    PACK_BUDGET,
    PACKING_ORACLE,
)
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.replay import file_replay_stream


def _media_video_stream(spark: SparkSession) -> DataFrame:
    """Replay the MJV clip table as a file-source stream
    (layout-robust: sources/replay.py handles both the single-file
    fixture layout and a Spark-written directory table)."""
    return file_replay_stream(
        spark, os.path.join(ensure_media_fixtures(), "media_video.parquet")
    )


@register("stream_scene_cuts", oracle=SCENE_CUTS_ORACLE)
def stream_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection as continuous intake — the live video
    segmentation front of a curation pipeline: each arriving clip is
    container-parsed and reduced to per-frame integer luma totals
    INSIDE the stream (operators/multimodal.video_frame_stats as a
    stateless Arrow ``mapInPandas`` over the micro-batch — 2 int64s
    per frame leave the task, never pixels), so the expensive decode
    happens exactly once, at arrival. The lag-window cut rule — the
    exact cross-multiply |ls_i*np_prev − ls_prev*np_i| > T*np_i*np_prev
    of plans/ext_multimodal.ext_multimodal_scene_cuts — runs on the
    drained frame-stats rows, which are clip-local, so any micro-batch
    arrival order yields the same per-clip sequences and the result
    hash-matches the batch oracle.

    Scale (100 TB): the in-stream kernel is payload-partitioned and
    stateless — no state store at all; drained stats are frame-count
    bounded (2 int64s/frame), and the cut window partitions by
    media_id, shuffling only those rows."""
    from bigdata_spark_realtime_spark.operators.multimodal import (
        video_frame_stats,
    )
    from bigdata_spark_realtime_spark.plans.streaming_queries import (
        _drain_to_memory,
    )

    media = _media_video_stream(spark)
    st = _drain_to_memory(video_frame_stats(media), spark)
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    lagd = st.select(
        "media_id",
        "frame_idx",
        "luma_sum",
        "n_pix",
        F.lag("luma_sum").over(w).alias("pls"),
        F.lag("n_pix").over(w).alias("pnp"),
    )
    return lagd.where(
        F.col("pls").isNotNull()
        & (
            F.abs(
                F.col("luma_sum") * F.col("pnp")
                - F.col("pls") * F.col("n_pix")
            )
            > F.lit(SCENE_CUT_THRESHOLD) * F.col("n_pix") * F.col("pnp")
        )
    ).select("media_id", F.col("frame_idx").cast("int").alias("cut_frame"))


@register("stream_pack_shards", oracle=PACKING_ORACLE)
def stream_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing as continuous intake — documents stream in and
    the map-side shard assignment (`h32(doc_id) % N_SHARDS`, the only
    corpus-wide operation) runs per micro-batch, stateless; the
    per-shard greedy packing — the running-total window over the
    deterministic (hash, doc_id) order of
    plans/ext_packing.ext_pack_shards — runs on the drained shard
    rows. The order key is data-derived, not arrival-derived, so any
    micro-batch schedule converges to the same packs and the batch
    PACKING_ORACLE verifies the stream end-to-end.

    Scale (100 TB): in-stream work is a stateless projection (no
    shuffle, no state store); the drained side packs each shard as an
    independent window partition — the same one-shuffle plan as the
    batch operator, with arrival-time shard assignment amortized into
    ingest."""
    from bigdata_spark_realtime_spark.plans.streaming_queries import (
        _drain_to_memory,
    )

    docs = file_replay_stream(
        spark, os.path.join(sf_dir, "documents.parquet")
    )
    h = H.h32(F.col("doc_id").cast("string"))
    sharded = _drain_to_memory(
        docs.select(
            "doc_id", "n_chars", h.alias("h"), (h % N_SHARDS).alias("shard")
        ),
        spark,
    )
    win = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_chars").over(win), F.lit(0))
    return sharded.select(
        "doc_id",
        "shard",
        F.floor(start / PACK_BUDGET).cast("long").alias("pack_id"),
        start.cast("long").alias("start_offset"),
    )
