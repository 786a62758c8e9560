"""Point-in-time SCD2 dimension lookup — the feature-store join.

Attach to each fact row (orders) the versioned-dimension state that was
valid AT the fact's own timestamp: ``valid_from_us <= t < valid_to_us``
against the SCD2 intervals built by `plans/ext_scd2.py`. This is the
"time-travel" join every training-data pipeline needs to avoid label
leakage — features must reflect what was knowable at event time, not
the current dimension row (Kimball SCD Type 2 lookup; the same shape
feature stores call point-in-time correctness). The reference's dim
joins (`realtime/app/DwdOrderApp.scala` J1/J2, SURVEY §2.6) always read
the CURRENT dimension row; this operator is the versioned upgrade.

Scale (100 TB): the naive formulation is an interval theta-join —
``f.key = d.key AND f.t BETWEEN d.from AND d.to`` — which Spark can
only execute as a per-key pairwise product (or, worse, a broadcast
nested loop). Because SCD2 intervals TILE time per key (contiguous,
non-overlapping, last one open — guaranteed by the gaps-and-islands
builder), interval containment is equivalent to an as-of join on
``valid_from_us``: the interval containing ``t`` is exactly the one
with the greatest ``valid_from_us <= t``. So the plan is the
union-and-window as-of (`operators/asof.py`): ONE shuffle on the user
key, linear in |facts| + |intervals|, no pairwise product anywhere —
pinned by the hygiene test (no CartesianProduct /
BroadcastNestedLoopJoin in the plan). The oracle states the
containment contract directly (BETWEEN join); tiling makes the two
formulations identical, which is precisely what the hash check proves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.operators.asof import asof_join
from bigdata_spark_realtime_spark.plans.ext_scd2 import SCD2_ORACLE, ext_scd2_intervals
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

# The interval set comes verbatim from the SCD2 oracle (single source
# of truth) — nested WITH inside a CTE is standard DuckDB. LEFT JOIN:
# orders before the user's first event, or by users with no events,
# keep a NULL state. Tiling guarantees at most one matching interval,
# so the join never duplicates facts.
PIT_ORACLE = f"""
WITH iv AS ({SCD2_ORACLE})
SELECT o.o_orderkey,
       o.o_custkey,
       epoch_us(o.o_orderdate) AS order_us,
       i.state AS state_at_order,
       CAST(i.valid_from_us AS BIGINT) AS state_since_us
FROM orders o
LEFT JOIN iv i
  ON o.o_custkey = i.user_id
 AND epoch_us(o.o_orderdate) >= i.valid_from_us
 AND epoch_us(o.o_orderdate) <  i.valid_to_us
"""


@register("ext_pit_scd2_join", oracle=PIT_ORACLE)
def ext_pit_scd2_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders joined to the user-state SCD2 interval containing the
    order timestamp — executed as a single-shuffle as-of join on
    ``valid_from_us`` (legal because intervals tile time per user),
    never as an interval product."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        # parquet timestamp[us] reads as NTZ; cast re-tags it in the
        # pinned-UTC session zone, matching DuckDB's epoch_us on the
        # same naive value
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("order_us"),
    )
    # Drop zero-width intervals (a same-microsecond state flip gives
    # the earlier island valid_to == valid_from): they match nothing in
    # the oracle's half-open BETWEEN containment, and removing them
    # restores asof_join's "right side unique per (key, time)"
    # precondition — the survivor at a shared valid_from_us is the last
    # island, whose interval is the one that actually covers t >= from.
    iv = (
        ext_scd2_intervals(spark, sf_dir)
        .filter(F.col("valid_to_us") > F.col("valid_from_us"))
        .select(
            "user_id",
            "valid_from_us",
            F.col("state").alias("state_at_order"),
            F.col("valid_from_us").alias("state_since_us"),
        )
    )
    return asof_join(
        orders,
        iv,
        on=("o_custkey", "user_id"),
        time=("order_us", "valid_from_us"),
        payload=["state_at_order", "state_since_us"],
    ).select(
        "o_orderkey",
        "o_custkey",
        "order_us",
        "state_at_order",
        # honest NULL for "no interval covers the order" (NULL-bearing
        # BIGINT hash path driver-proven: r11 ext_null_hash_probe, r13
        # ext_pit_scd2_join itself)
        F.col("state_since_us").cast("long").alias("state_since_us"),
    )
