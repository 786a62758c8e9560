"""Tail-registration shim: round-13 streaming funnel twin.

``stream_funnel_steps`` — the live conversion funnel (the realtime
product-analytics board the reference's DAU/order pipelines feed:
`app/dwd_OrderApp.scala` materializes joined order state for exactly
this kind of downstream readout): events arrive continuously, the intake
does the stateless normalization map — filter to the three funnel step
types, project (user_id, step, epoch-us) — so the drained state is the
funnel-relevant slice only, then the staged conditional mins (t1 =
first signup, t2 = first click after t1, t3 = first purchase after t2,
chain within 7 days) run on the drained rows with the same semantics
as the batch operator ``plans/ext_funnel.ext_funnel_steps``. Step
times are data timestamps, not arrival times, so any micro-batch
schedule converges to the same three counts and the batch
FUNNEL_ORACLE verifies the stream end-to-end.

Defined at the end of the registry walk to respect the pinned gate
window's splice rule; enters PENDING_FIRST_DRIVER_ROW (seats R15 — the
R14 window predates this module).

Scale (100 TB): the in-stream map is stateless (no state store) and
discards every non-funnel event at ingest — the drained state is the
step-event slice, a small fraction of the firehose. The drained side
stages the conditional mins as chained unbounded window expressions
over ONE user_id partition — one scan, one exchange, no per-user sort
(unbounded frames need no orderBy) — then reduces to user-cardinality
rows and three counts; the raw slice is never joined or re-scanned.
For an unbounded 24/7 deployment the same staged mins run windowed per
day with a watermark; the drained-replay twin pins the semantics the
windowed variant must preserve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.ext_funnel import (
    FUNNEL_ORACLE,
    FUNNEL_WINDOW_US,
)
from bigdata_spark_realtime_spark.plans.registry import register


@register("stream_funnel_steps", oracle=FUNNEL_ORACLE)
def stream_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (7-day completion window) as continuous
    intake: stateless in-stream filter+projection, staged
    conditional-min aggregation on the drained step events."""
    from bigdata_spark_realtime_spark.plans.streaming_queries import (
        _drain_to_memory,
        _events_stream,
    )

    ev_stream = _events_stream(spark, sf_dir)
    proj = ev_stream.where(
        F.col("event_type").isin("signup", "click", "purchase")
    ).select("user_id", "event_type", F.unix_micros("event_time").alias("us"))
    ev = _drain_to_memory(proj, spark)

    # Join-free staging (the batch plan's per-stage joins would self-join
    # the memory-sink View, which defeats Spark's self-join attribute
    # dedup — INTERNAL_ERROR "conflicting references"): the conditional
    # mins chain as window expressions over ONE user partition instead.
    # t2's predicate reads the t1 column the previous Window produced, so
    # Catalyst stacks three Window nodes over a single user_id exchange —
    # one scan, one shuffle, no per-user sort (unbounded frames need no
    # orderBy). Semantics identical to FUNNEL_ORACLE's staged mins.
    w = Window.partitionBy("user_id")
    typed = ev.withColumn(
        "t1",
        F.min(F.when(F.col("event_type") == "signup", F.col("us"))).over(w),
    )
    typed = typed.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("us") > F.col("t1")),
                F.col("us"),
            )
        ).over(w),
    )
    typed = typed.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("us") > F.col("t2")),
                F.col("us"),
            )
        ).over(w),
    )
    per_user = typed.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    counts = per_user.agg(
        F.count("t1").cast("bigint").alias("n1"),
        F.count("t2").cast("bigint").alias("n2"),
        F.count(
            F.when(F.col("t3") - F.col("t1") <= FUNNEL_WINDOW_US, F.lit(1))
        )
        .cast("bigint")
        .alias("n3"),
    )
    return counts.selectExpr(
        "stack(3, 1, 'signup', n1,"
        "         2, 'click_after_signup', n2,"
        "         3, 'purchase_in_window', n3)"
        " AS (step, step_name, n_users)"
    ).select(
        F.col("step").cast("int").alias("step"), "step_name", "n_users"
    )
