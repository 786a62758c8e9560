"""Tail-registration module for round-8+ streaming twins.

Same device as plans/ext_media_tail.py: new queries must register AFTER
the pinned first-50 gate window (plans/registry._PLAN_MODULES comment —
adding a ``@register`` inside an in-window module silently evicts the
window's tail from the external gate). Streaming helpers live in
plans/streaming_queries; this shim only registers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdata_spark_realtime_spark.plans.registry import register


# NOTE: these oracle imports run at module-import time. For any sibling
# listed AFTER this shim in registry._PLAN_MODULES (ext_embed,
# ext_sketch_tail in the r9 order), the import PULLS that module's
# registrations forward to THIS shim's position — so the effective
# registration order follows the import graph, not the _PLAN_MODULES
# text order. Window rotations must count slots against the effective
# order (assert the first-50 list in a fresh interpreter, as
# tests/test_registry.py does), never against the module list alone.
from bigdata_spark_realtime_spark.plans.ext_dsir import DSIR_ORACLE
from bigdata_spark_realtime_spark.plans.ext_embed import (
    CENTROIDS_ORACLE,
    QUANTIZE_ORACLE,
)
from bigdata_spark_realtime_spark.plans.ext_sketch_tail import QSKETCH_ORACLE


@register("stream_dsir_select", oracle=DSIR_ORACLE)
def stream_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection as continuous intake — the production shape for
    importance-weighting documents at ingest time: the ratio table is
    FIXED (trained batch-side on the deterministic 10% hash-slice; a
    fixed-size model by construction, plans/ext_dsir.train_dsir) and
    broadcast; the corpus STREAMS through the identical stateless
    scoring kernel (plans/ext_dsir.make_score_kernel runs unchanged on
    a streaming frame), per-doc rows append with no streaming state at
    all. The corpus-mean keep rule is applied to the drained result —
    in production the mean is a slowly-moving statistic refreshed
    batch-side, exactly like the model. Oracle = the batch operator's
    SQL: scoring is per-row and the mean is computed over the same
    complete corpus, so streamed and batched answers are identical."""
    from bigdata_spark_realtime_spark.plans.ext_dsir import (
        SCORE_SCHEMA,
        keep_by_corpus_mean,
        make_score_kernel,
        train_dsir,
    )
    from bigdata_spark_realtime_spark.plans.streaming_queries import (
        _docs_stream,
        _drain_to_memory,
    )

    ratio = train_dsir(spark, sf_dir)
    bc = spark.sparkContext.broadcast(ratio)
    scored = (
        _docs_stream(spark, sf_dir)
        .select("doc_id", "text")
        .mapInPandas(make_score_kernel(bc), SCORE_SCHEMA)
    )
    return keep_by_corpus_mean(_drain_to_memory(scored, spark))


@register("stream_embed_quantize", oracle=QUANTIZE_ORACLE)
def stream_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 quantization as continuous intake — the production shape
    for an embedding feed landing in an ANN/KV store: the per-dim
    scale table is FIXED (fitted batch-side on the standing corpus —
    64 rows at any scale, plans/ext_embed.fit_scales) and enters each
    micro-batch as a broadcast stream-static join; vectors STREAM
    through the identical pure-codegen quantize with zero streaming
    state (per-row op, append mode). In production the scales refresh
    batch-side like any model artifact; re-fitting on every batch
    would let the quantization of old vectors drift. Oracle = the
    batch operator's SQL: the quantize is per-row and the scales come
    from the same complete corpus, so streamed == batched exactly."""
    from pyspark.sql import functions as F

    from bigdata_spark_realtime_spark.plans.ext_embed import (
        fit_scales,
        quantize_components,
    )
    from bigdata_spark_realtime_spark.plans.streaming_queries import (
        _drain_to_memory,
        _embeddings_stream,
    )

    scales = fit_scales(spark, sf_dir)
    dims = (
        _embeddings_stream(spark, sf_dir)
        .where(F.col("embedding").isNotNull())
        .select("vec_id", F.posexplode("embedding").alias("dim", "v"))
    )
    return _drain_to_memory(quantize_components(dims, scales), spark)


@register("stream_embed_centroids", oracle=CENTROIDS_ORACLE)
def stream_embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label centroids maintained as STATEFUL streaming aggregation —
    the continuously-refreshed class-prototype store (the statistic
    `ext_kmeans_assign` and a production quantizer refresh consume).
    Where the HLL/CMS twins stream mergeable *sketch* state, this
    streams mergeable *numeric* state: per-(label, dim) running
    ``(sum(vq), count)`` in Spark's state store, updated per
    micro-batch in complete mode. Integer sums are associative and
    accumulation-order-independent, so ANY micro-batch arrival order
    produces bit-identical state — the drained result hash-matches
    the batch operator's oracle exactly. State is L x 64 rows
    (dimension-bounded), never corpus-sized; the truncating-DIV mean
    is taken on the drained frame, outside the incremental state."""
    from pyspark.sql import functions as F

    from bigdata_spark_realtime_spark.plans.ext_embed import FIXED_POINT
    from bigdata_spark_realtime_spark.plans.streaming_queries import (
        _drain_to_memory,
        _embeddings_stream,
    )

    vq = (
        _embeddings_stream(spark, sf_dir)
        .where(F.col("embedding").isNotNull())
        .select("label", F.posexplode("embedding").alias("dim", "v"))
        .select(
            "label",
            "dim",
            F.floor(
                F.col("v").cast("double") * F.lit(float(FIXED_POINT))
            )
            .cast("bigint")
            .alias("vq"),
        )
    )
    state = vq.groupBy("label", "dim").agg(
        F.sum("vq").alias("sum_q"),
        F.count(F.lit(1)).alias("n_vectors"),
    )
    drained = _drain_to_memory(state, spark, output_mode="complete")
    return drained.select(
        "label",
        F.col("dim").cast("int").alias("dim"),
        F.expr("sum_q DIV n_vectors").alias("centroid_q"),
        "n_vectors",
    )


@register("stream_quantile_sketch", oracle=QSKETCH_ORACLE)
def stream_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantile sketch as continuous intake — real-time latency/
    value percentiles, the metric every streaming SLO dashboard needs:
    per-(event_type, bucket) counts accumulate in Spark's state store
    in complete mode. Integer bucket counts merge by ADDITION, which
    is associative and order-independent, so ANY micro-batch arrival
    order produces the same state and the drained result hash-matches
    the batch operator's oracle exactly. State is bucket-count-bounded
    (~hundreds of rows per group), never value-count-bounded; the
    p50/p95/p99 read stays a driver-side walk over the drained frame
    (plans/ext_sketch_tail.qsketch_quantile)."""
    from pyspark.sql import functions as F

    from bigdata_spark_realtime_spark.plans.streaming_queries import (
        _drain_to_memory,
        _events_stream,
    )

    ev = _events_stream(spark, sf_dir).where(F.col("value") > 0)
    cents = ev.select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("v100"),
    )
    octave_key = F.expr(
        "shiftleft(CAST(length(bin(v100)) AS BIGINT), 3)"
        " | shiftright(v100, length(bin(v100)) - 3)"
    )
    keyed = cents.select(
        "event_type",
        F.when(F.col("v100") < 8, F.col("v100"))
        .otherwise(octave_key)
        .cast("bigint")
        .alias("bkt"),
    )
    state = keyed.groupBy("event_type", "bkt").agg(
        F.count(F.lit(1)).alias("ct")
    )
    return _drain_to_memory(state, spark, output_mode="complete")


def _rollup_oracle() -> str:
    from bigdata_spark_realtime_spark.plans.ext_rollup import ROLLUP_ORACLE

    return ROLLUP_ORACLE


@register("stream_rollup_cascade", oracle=_rollup_oracle())
def stream_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rollup cascade as continuous intake — the live hypertable:
    the HOURLY grain accumulates in Spark's state store (complete
    mode, integer-cent sums quantized BEFORE the first aggregation so
    merge order is irrelevant); the DAILY grain re-aggregates the
    drained hourly frame exactly as the batch operator does, never
    touching raw events again. Hour-count-bounded state forever;
    oracle = the batch operator's SQL (which itself goes straight to
    raw — the stream must reproduce the lossless cascade)."""
    from pyspark.sql import functions as F

    from bigdata_spark_realtime_spark.plans.streaming_queries import (
        _drain_to_memory,
        _events_stream,
    )

    # event_time is the helper's vintage-normalized TimestampType
    # column (raw `ts` may be int64 nanos in some testdata vintages)
    ev = _events_stream(spark, sf_dir).select(
        F.date_format(
            F.date_trunc("hour", "event_time"), "yyyy-MM-dd HH"
        ).alias("hour"),
        F.date_format(
            F.date_trunc("day", "event_time"), "yyyy-MM-dd"
        ).alias("day"),
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    hourly = ev.groupBy("hour", "day", "event_type").agg(
        F.count(F.lit(1)).alias("ct"),
        F.sum("cents").alias("value_cents"),
    )
    drained = _drain_to_memory(hourly, spark, output_mode="complete")
    return drained.groupBy("day", "event_type").agg(
        F.sum("ct").alias("ct"),
        F.sum("value_cents").alias("value_cents"),
    )
