"""Tail-registration shim: streaming twins for the round-9c batch ops.

Three more continuous-intake twins over associative state, sharing the
batch projections and oracles: the live trending board (per-item
hourly counts), the live decayed leaderboard ((item, day) cent sums)
and the live cohort-LTV curve (per-user first-seen min + per-(user,
day) purchase sums). Defined at the end of the registry walk to
respect the pinned gate window's splice rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.ext_cohortval import (
    COHORT_VALUE_ORACLE,
    _cohort_grid_cum,
)
from bigdata_spark_realtime_spark.plans.ext_decay import (
    DECAY_ORACLE,
    _leaderboard_from_partials,
)
from bigdata_spark_realtime_spark.plans.ext_windows2 import (
    TRENDING_ORACLE,
    _trending_from_partials,
)
from bigdata_spark_realtime_spark.plans.registry import register


def _item_expr():
    return F.get_json_object("props", "$.k").cast("bigint").alias("item")


@register("stream_trending_items", oracle=TRENDING_ORACLE)
def stream_trending_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending as continuous intake — the live risers board: (item,
    hour) counts accumulate as one complete-mode aggregation
    (associative; state bounded by items × hours), then the lag + rank
    projection runs on the drained partials exactly like the batch
    operator. Oracle = the batch SQL."""
    from bigdata_spark_realtime_spark.plans.streaming_queries import (
        _drain_to_memory,
        _events_stream,
    )

    ev = _events_stream(spark, sf_dir)
    state = (
        ev.where(
            F.col("event_type").isin("click", "view", "purchase")
            & F.col("props").isNotNull()
        )
        .select(_item_expr(), F.date_trunc("hour", "event_time").alias("h"))
        .where(F.col("item").isNotNull())
        .groupBy("item", "h")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ih = _drain_to_memory(state, spark, output_mode="complete").select(
        "item", "h", F.col("c").cast("bigint").alias("c")
    )
    return _trending_from_partials(ih)


@register("stream_decayed_leaderboard", oracle=DECAY_ORACLE)
def stream_decayed_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decayed ranking as continuous intake — the live leaderboard:
    (item, day) cent sums accumulate in complete mode (associative,
    items × days state), then the integer decay shift against the
    drained max-day anchor and the top-K run exactly like the batch
    operator. Oracle = the batch SQL."""
    from bigdata_spark_realtime_spark.plans.streaming_queries import (
        _drain_to_memory,
        _events_stream,
    )

    ev = _events_stream(spark, sf_dir)
    state = (
        ev.where(
            F.col("event_type").isin("click", "view", "purchase")
            & F.col("props").isNotNull()
        )
        .select(
            _item_expr(),
            F.expr("unix_micros(event_time) div 86400000000").alias("day"),
            F.floor(F.col("value") * 100).cast("bigint").alias("v100"),
        )
        .where(F.col("item").isNotNull())
        .groupBy("item", "day")
        .agg(F.sum("v100").alias("v100"))
    )
    id_day = _drain_to_memory(state, spark, output_mode="complete").select(
        "item", "day", F.col("v100").cast("bigint").alias("v100")
    )
    return _leaderboard_from_partials(id_day)


@register("stream_cohort_value", oracle=COHORT_VALUE_ORACLE)
def stream_cohort_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV as continuous intake — the live acquisition-value
    curve: TWO complete-mode states, both associative — per-user
    first-seen day (a min) and per-(user, day) purchase count/cent
    sums (user × day bounded). The drained frames join batch-side (one
    side renamed: both derive from memory-sink relations), re-aggregate
    into the (cohort, offset) grid, and run the same cumulative
    projection. Oracle = the batch SQL."""
    from bigdata_spark_realtime_spark.plans.streaming_queries import (
        _drain_to_memory,
        _events_stream,
    )

    ev = _events_stream(spark, sf_dir)
    firsts_state = ev.groupBy("user_id").agg(
        F.min(F.expr("unix_micros(event_time) div 86400000000")).alias(
            "cohort_day"
        )
    )
    spend_state = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.expr("unix_micros(event_time) div 86400000000").alias("day"),
            F.floor(F.col("value") * 100).cast("bigint").alias("v100"),
        )
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v100").alias("cents"))
    )
    firsts = _drain_to_memory(firsts_state, spark, output_mode="complete").select(
        F.col("user_id").alias("uid_f"),
        F.col("cohort_day").cast("bigint").alias("cohort_day"),
    )
    spend = _drain_to_memory(spend_state, spark, output_mode="complete").select(
        "user_id",
        F.col("day").cast("bigint").alias("day"),
        F.col("n").cast("bigint").alias("n"),
        F.col("cents").cast("bigint").alias("cents"),
    )
    grid = (
        spend.join(firsts, spend["user_id"] == firsts["uid_f"])
        .select(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
            "n",
            "cents",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(
            F.sum("n").cast("bigint").alias("n_purchases"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )
    return _cohort_grid_cum(grid)
