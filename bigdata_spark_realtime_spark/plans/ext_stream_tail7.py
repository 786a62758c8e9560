"""Tail-registration shim: round-15 serving-stats streaming twins.

The reference's `/statsByItem` endpoint (`ia/publisherServiceImpl.java:
29-91`) reads an aggregate that its streaming apps
(`app/dwd_OrderApp.scala` et al.) maintain continuously from the live
order stream; the batch queries ``serving_stats_by_item_age`` /
``_gender`` (`plans/serving.py`) verify the aggregate itself, and
these twins verify the CONTINUOUS-INTAKE path: lineitem rows arrive as
a stream, the in-stream stage does the reference's dim-enrichment
chain (J1/J2 stream-static joins: matched-item part filter broadcast,
orders→customer for age/gender), and the streaming aggregation
maintains the running ``sum(split_total_amount)`` per user_age /
user_gender — the exact state the serving layer reads. The client-side
re-bucket (A5 age buckets, A6 gender decode) runs on the drained
frame, as in the batch query, and the batch STATS oracles verify the
stream end-to-end.

The dim-enrichment chain is REBUILT here against the stream rather
than imported from ``serving._wide`` — extracting a shared helper
would edit `plans/serving.py` and body-drift four r14-green serving
rows out of their driver anchor for zero behavior change (the
freshness-audit lesson of rounds 13-14: shared-module edits re-open
green rows; the duplication is the cheaper side of that trade). The
ORACLE strings and ``ITEM`` are likewise rebuilt from the same corpus
/ scalar-fns primitives instead of imported: a module-level serving
import would DRAG serving's four registrations into any gate window
this module leads (oracle strings bind at decoration time, so the
import cannot be lazified), and the precomputed R16 window needs
these two queries to cost exactly two slots. Byte-equality with
serving's originals is pinned in tests/test_round15_property.py.

Defined at the end of the registry walk to respect the pinned R15 gate
window's splice rule; enters PENDING_FIRST_DRIVER_ROW (seats R16).

Scale (100 TB): the stream-static joins are STATELESS — no state-store
growth; the filtered part side is explicitly broadcast (streaming
plans get no AQE promotion), and the orders/customer sides shuffle
only the matched-item slice of the stream (the part filter prunes
~99% of rows before any exchange). Aggregate state is one row per
user_age (< 130) / per gender (2) — the minimal running aggregate the
endpoint needs, same shape as the reference's per-day DAU state. In a
24/7 deployment the same aggregation runs per (dt, user_age) with a
watermark; the drained-replay twin pins the semantics that variant
must preserve.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.functions import scalar as fns
from bigdata_spark_realtime_spark.plans.corpus import (
    AGE_REF_DATE,
    BIRTHDAY_SQL,
    GENDER_SQL,
    birthday_col,
    gender_col,
)
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: byte-identical rebuilds of plans/serving.py's ITEM / _WIDE_CTE /
#: STATS oracles (equality pinned in tests/test_round15_property.py)
ITEM = "widget"

_WIDE_CTE = f"""
WITH wide AS (
  SELECT l.l_extendedprice * (1 - l.l_discount) AS split_total_amount,
         {fns.age_years_sql(f'({BIRTHDAY_SQL})', f"DATE '{AGE_REF_DATE}'")} AS user_age,
         {GENDER_SQL} AS user_gender
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE {fns.match_all_tokens_sql('p.p_name', ITEM)}
)
"""

STATS_AGE_ORACLE = (
    _WIDE_CTE
    + f"""
SELECT {fns.age_bucket_sql('user_age')} AS name,
       round(sum(amount), 2) AS value
FROM (SELECT user_age, sum(split_total_amount) AS amount FROM wide GROUP BY 1)
GROUP BY 1
"""
)

STATS_GENDER_ORACLE = (
    _WIDE_CTE
    + f"""
SELECT {fns.gender_decode_sql('user_gender')} AS name,
       round(sum(amount), 2) AS value
FROM (SELECT user_gender, sum(split_total_amount) AS amount FROM wide GROUP BY 1)
GROUP BY 1
"""
)


def _wide_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem replayed as a file-source stream, enriched in-stream
    with the three static dims (same join graph as ``serving._wide``,
    stream-static instead of batch-batch)."""
    from bigdata_spark_realtime_spark.sources.replay import file_replay_stream

    li = file_replay_stream(
        spark, os.path.join(sf_dir, "lineitem.parquet")
    ).select("l_orderkey", "l_partkey", "l_extendedprice", "l_discount")
    p = (
        load_table(spark, sf_dir, "part")
        .where(fns.match_all_tokens(F.col("p_name"), ITEM))
        .select("p_partkey")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        fns.age_years(birthday_col(), F.to_date(F.lit(AGE_REF_DATE))).alias(
            "user_age"
        ),
        gender_col().alias("user_gender"),
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "split_total_amount"
            ),
            "user_age",
            "user_gender",
        )
    )


@register("stream_stats_by_item_age", oracle=STATS_AGE_ORACLE)
def stream_stats_by_item_age(spark: SparkSession, sf_dir: str) -> DataFrame:
    """statsByItem?t=age as continuous intake: stream-static dim
    enrichment, running per-user_age sum in the state store, A5
    re-bucket on the drained frame."""
    from bigdata_spark_realtime_spark.plans.streaming_queries import (
        _drain_to_memory,
    )

    inner = _wide_stream(spark, sf_dir).groupBy("user_age").agg(
        F.sum("split_total_amount").alias("amount")
    )
    drained = _drain_to_memory(inner, spark, output_mode="complete")
    return drained.groupBy(
        fns.age_bucket(F.col("user_age")).alias("name")
    ).agg(F.round(F.sum("amount"), 2).alias("value"))


@register("stream_stats_by_item_gender", oracle=STATS_GENDER_ORACLE)
def stream_stats_by_item_gender(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """statsByItem?t=gender as continuous intake: same intake chain,
    running per-gender sum, A6 decode on the drained frame."""
    from bigdata_spark_realtime_spark.plans.streaming_queries import (
        _drain_to_memory,
    )

    inner = _wide_stream(spark, sf_dir).groupBy("user_gender").agg(
        F.sum("split_total_amount").alias("amount")
    )
    drained = _drain_to_memory(inner, spark, output_mode="complete")
    return drained.groupBy(
        fns.gender_decode(F.col("user_gender")).alias("name")
    ).agg(F.round(F.sum("amount"), 2).alias("value"))
