"""Tail-registration shim: streaming twins for the round-9 batch ops.

Five batch operators whose state is associative get continuous-intake
twins here (the engine's standing rule: any complete-mode-expressible
aggregate ships with a stream twin sharing the batch oracle): the
Z-order census, the A/B scoreboard, the mix-Gini monitor, the
gap-filled resample and the KS drift gate. Defined at the end of the
registry walk to respect the pinned gate window's splice rule
(plans/registry._PLAN_MODULES).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.functions import hashing as H
from bigdata_spark_realtime_spark.plans.ext_drift import (
    DRIFT_ORACLE,
    GINI_ORACLE,
    _gini_from_counts,
)
from bigdata_spark_realtime_spark.plans.ext_timeseries import GAPFILL_ORACLE
from bigdata_spark_realtime_spark.plans.ext_paths import AB_ORACLE, PPM
from bigdata_spark_realtime_spark.plans.ext_zorder import (
    ZBITS,
    ZBUCKET_SHIFT,
    ZORDER_ORACLE,
    _morton_spark,
)
from bigdata_spark_realtime_spark.plans.registry import register


@register("stream_zorder_census", oracle=ZORDER_ORACLE)
def stream_zorder_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout census as continuous intake — the live writer's
    bucket planner: the Morton key is a stateless map-side expression
    on the stream, and count/min/max per bucket are associative, so
    the census accumulates as one complete-mode aggregation with
    1024-row state. Oracle = the batch SQL."""
    from bigdata_spark_realtime_spark.plans.streaming_queries import (
        _drain_to_memory,
        _events_stream,
    )

    ev = _events_stream(spark, sf_dir)
    keyed = ev.select(
        F.expr(f"user_id % {1 << ZBITS}").alias("x"),
        F.expr(
            f"(unix_micros(event_time) div 3600000000) % {1 << ZBITS}"
        ).alias("y"),
    ).select(F.expr(_morton_spark("x", "y")).cast("bigint").alias("zkey"))
    state = keyed.groupBy(
        F.expr(f"shiftright(zkey, {ZBUCKET_SHIFT})").alias("zbucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("zkey").alias("z_min"),
        F.max("zkey").alias("z_max"),
    )
    return _drain_to_memory(state, spark, output_mode="complete").select(
        "zbucket",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("z_min").cast("bigint").alias("z_min"),
        F.col("z_max").cast("bigint").alias("z_max"),
    )


@register("stream_ab_assignment", oracle=AB_ORACLE)
def stream_ab_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B conversion as continuous intake — the live experiment
    scoreboard: per-user converted-flags accumulate as a complete-mode
    max (associative, user-bounded state — the same cardinality any
    batch per-user aggregate materializes); arm assignment and the
    per-arm counts run on the drained frame exactly like the batch
    operator. Oracle = the batch SQL."""
    from bigdata_spark_realtime_spark.plans.streaming_queries import (
        _drain_to_memory,
        _events_stream,
    )

    ev = _events_stream(spark, sf_dir)
    state = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    per_user = _drain_to_memory(state, spark, output_mode="complete").select(
        (H.h32(F.concat(F.col("user_id").cast("string"), F.lit("|ab"))) % 2)
        .alias("arm"),
        F.col("converted").cast("bigint").alias("converted"),
    )
    return (
        per_user.groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("converted").cast("bigint").alias("n_converted"),
        )
        .select(
            F.col("arm").cast("bigint").alias("arm"),
            "n_users",
            "n_converted",
            F.expr(f"({PPM} * n_converted) div n_users").alias("conv_ppm"),
        )
    )


@register("stream_event_mix_gini", oracle=GINI_ORACLE)
def stream_event_mix_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix impurity as continuous intake — the live composition
    monitor: (day, type) counts accumulate as one complete-mode
    aggregation (calendar-bounded state), then the permille-quantized
    Gini projection runs on the drained partials exactly like the
    batch operator. Oracle = the batch SQL."""
    from bigdata_spark_realtime_spark.plans.streaming_queries import (
        _drain_to_memory,
        _events_stream,
    )

    ev = _events_stream(spark, sf_dir)
    state = ev.groupBy(
        F.date_format(F.date_trunc("day", "event_time"), "yyyy-MM-dd").alias(
            "day"
        ),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("c"))
    d = _drain_to_memory(state, spark, output_mode="complete").select(
        "day", "event_type", F.col("c").cast("bigint").alias("c")
    )
    return _gini_from_counts(d)


@register("stream_timeseries_gapfill", oracle=GAPFILL_ORACLE)
def stream_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled resample as continuous intake — the live metrics
    dashboard's dense grid: hourly (count, cents-sum) partials
    accumulate as one complete-mode aggregation (associative,
    calendar-bounded state), then the sequence-explode grid and the
    LOCF window run on the drained partials exactly like the batch
    operator. Oracle = the batch SQL."""
    from bigdata_spark_realtime_spark.plans.ext_timeseries import (
        _gapfill_from_hourly,
    )
    from bigdata_spark_realtime_spark.plans.streaming_queries import (
        _drain_to_memory,
        _events_stream,
    )

    ev = _events_stream(spark, sf_dir)
    state = ev.groupBy(
        "event_type", F.date_trunc("hour", "event_time").alias("h")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("v100"),
    )
    hourly = _drain_to_memory(state, spark, output_mode="complete").select(
        "event_type",
        "h",
        F.col("cnt").cast("bigint").alias("cnt"),
        F.col("v100").cast("bigint").alias("v100"),
    )
    return _gapfill_from_hourly(hourly, "stream_gapfill")


@register("stream_distribution_drift", oracle=DRIFT_ORACLE)
def stream_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift monitoring as continuous intake — the live data-quality
    gate: (type, day, octave-bucket) counts accumulate as one
    complete-mode aggregation (bounded by days × types × ~60 buckets),
    then the midpoint split and cross-multiplied KS run on the drained
    partials exactly like the batch operator. Oracle = the batch SQL."""
    from bigdata_spark_realtime_spark.plans.ext_drift import (
        _OCTAVE_SPARK,
        _drift_from_day_buckets,
    )
    from bigdata_spark_realtime_spark.plans.streaming_queries import (
        _drain_to_memory,
        _events_stream,
    )

    ev = _events_stream(spark, sf_dir)
    state = (
        ev.where(F.col("value") > 0)
        .select(
            "event_type",
            F.expr("unix_micros(event_time) div 86400000000").alias("day"),
            F.floor(F.col("value") * 100).cast("bigint").alias("v100"),
        )
        .withColumn("bkt", F.expr(_OCTAVE_SPARK))
        .groupBy("event_type", "day", "bkt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    d = _drain_to_memory(state, spark, output_mode="complete").select(
        "event_type", "day", "bkt", F.col("c").cast("bigint").alias("c")
    )
    return _drift_from_day_buckets(d)
