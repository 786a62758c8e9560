"""HLL set algebra: audience-overlap estimation from merged sketches.

The question a 100 TB pipeline answers with sketches, not joins: how
many users are in BOTH audience A and audience B (per event-type pair
here), estimated as ``|A| + |B| − |A∪B|`` where every term comes from
HLL register state — and the union sketch is just the ELEMENTWISE MAX
of the two register arrays. That max-merge is the property that makes
the whole scheme work at scale: union state never touches raw data,
any number of audiences combine associatively, and the registers are
the same 256 bytes per group that `ext_hll_distinct` maintains.

The query emits pure-integer sketch state (the scaled harmonic
denominators of A, B, and A∪B) beside the exact intersection for
test-scale verification; the float inclusion-exclusion estimate stays
driver-side (`hll_intersection_estimate`) with its accuracy pinned in
tests — same integer-state/float-derivation split as
`plans/ext_sketch.py` (module doc there explains why).

Registered from this tail module because plans/ext_sketch.py sits
INSIDE the pinned round-8 gate window (splice rule).

Scale (100 TB): the register build is the sketch shape — one
(group, bucket) shuffle with map-side partial max; the pair expansion
runs on the types × 256-row register table, never on events. The
exact-intersection column is the expensive thing the sketch replaces
and would be dropped in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.functions import hashing as H
from bigdata_spark_realtime_spark.plans.ext_sketch import M, S, hll_estimate
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

_REGS_CTE = f"""
WITH h AS (
  SELECT event_type,
         {H.h32_sql("CAST(user_id AS VARCHAR)")} AS hv
  FROM events
),
ranked AS (
  SELECT event_type,
         hv % {M} AS bucket,
         CASE WHEN hv // {M} = 0 THEN 25
              ELSE 25 - length(bin(hv // {M})) END AS rank
  FROM h
),
regs AS (
  SELECT event_type, bucket, max(rank) AS reg
  FROM ranked GROUP BY event_type, bucket
),
st AS (
  SELECT event_type,
         CAST(sum(1::BIGINT << ({S} - reg))
              + ({M} - count(*)) * (1::BIGINT << {S}) AS BIGINT)
           AS sum_scaled,
         CAST(count(*) AS BIGINT) AS nonzero
  FROM regs GROUP BY event_type
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM st a JOIN st b ON a.event_type < b.event_type
),
u AS (
  SELECT p.type_a, p.type_b, r.bucket, max(r.reg) AS reg
  FROM pairs p JOIN regs r
    ON r.event_type = p.type_a OR r.event_type = p.type_b
  GROUP BY p.type_a, p.type_b, r.bucket
),
stu AS (
  SELECT type_a, type_b,
         CAST(sum(1::BIGINT << ({S} - reg))
              + ({M} - count(*)) * (1::BIGINT << {S}) AS BIGINT)
           AS union_scaled,
         CAST(count(*) AS BIGINT) AS union_nonzero
  FROM u GROUP BY type_a, type_b
),
users AS (
  SELECT DISTINCT event_type, user_id FROM events
),
ex AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS exact_intersection
  FROM users a JOIN users b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
"""

HLL_SET_ORACLE = (
    _REGS_CTE
    + """
SELECT stu.type_a, stu.type_b,
       sa.sum_scaled AS scaled_a, sa.nonzero AS nonzero_a,
       sb.sum_scaled AS scaled_b, sb.nonzero AS nonzero_b,
       stu.union_scaled, stu.union_nonzero,
       CAST(coalesce(ex.exact_intersection, 0) AS BIGINT)
         AS exact_intersection
FROM stu
JOIN st sa ON sa.event_type = stu.type_a
JOIN st sb ON sb.event_type = stu.type_b
LEFT JOIN ex ON ex.type_a = stu.type_a AND ex.type_b = stu.type_b
"""
)


def hll_intersection_estimate(
    scaled_a: int, nonzero_a: int,
    scaled_b: int, nonzero_b: int,
    union_scaled: int, union_nonzero: int,
) -> float:
    """Inclusion-exclusion over the three sketch estimates —
    driver-side, outside the oracle-checked integers; each term gets
    the standard small-range linear-counting correction via
    hll_estimate."""
    est_a = hll_estimate(scaled_a, nonzero_a)
    est_b = hll_estimate(scaled_b, nonzero_b)
    est_u = hll_estimate(union_scaled, union_nonzero)
    return est_a + est_b - est_u


@register("ext_hll_set_algebra", oracle=HLL_SET_ORACLE)
def ext_hll_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event-type pair: the integer HLL state of both audiences
    and of their max-merged union, beside the exact intersection."""
    ev = load_table(spark, sf_dir, "events")
    hv = H.h32(F.col("user_id").cast("string"))
    w = F.expr(f"hv DIV {M}")
    rank = F.when(w == 0, 25).otherwise(25 - F.length(F.bin(w)))
    ranked = ev.select("event_type", hv.alias("hv")).select(
        "event_type", F.expr(f"hv % {M}").alias("bucket"), rank.alias("rank")
    )
    regs = ranked.groupBy("event_type", "bucket").agg(
        F.max("rank").alias("reg")
    )
    scaled = F.sum(
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {S} - reg)")
    ) + (M - F.count(F.lit(1))) * F.lit(1 << S)
    st = regs.groupBy("event_type").agg(
        scaled.cast("bigint").alias("sum_scaled"),
        F.count(F.lit(1)).cast("bigint").alias("nonzero"),
    )
    a = st.select(
        F.col("event_type").alias("type_a"),
        F.col("sum_scaled").alias("scaled_a"),
        F.col("nonzero").alias("nonzero_a"),
    )
    b = st.select(
        F.col("event_type").alias("type_b"),
        F.col("sum_scaled").alias("scaled_b"),
        F.col("nonzero").alias("nonzero_b"),
    )
    pairs = a.join(
        F.broadcast(b), F.col("type_a") < F.col("type_b")
    )
    # union registers: elementwise max across the two audiences — the
    # merge property; runs on the types x 256-row register table
    u = (
        pairs.join(
            regs,
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "bucket")
        .agg(F.max("reg").alias("reg"))
    )
    stu = u.groupBy("type_a", "type_b").agg(
        scaled.cast("bigint").alias("union_scaled"),
        F.count(F.lit(1)).cast("bigint").alias("union_nonzero"),
    )
    users = ev.select("event_type", "user_id").distinct()
    ua = users.select(
        F.col("event_type").alias("type_a"), F.col("user_id").alias("uid_a")
    )
    ub = users.select(
        F.col("event_type").alias("type_b"), F.col("user_id").alias("uid_b")
    )
    ex = (
        ua.join(
            ub,
            (F.col("uid_a") == F.col("uid_b"))
            & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    return (
        stu.join(pairs, ["type_a", "type_b"])
        .join(ex, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "scaled_a",
            "nonzero_a",
            "scaled_b",
            "nonzero_b",
            "union_scaled",
            "union_nonzero",
            F.coalesce(F.col("exact_intersection"), F.lit(0))
            .cast("bigint")
            .alias("exact_intersection"),
        )
    )


# ---------------------------------------------------------------------------
# quantile sketch: log-bucketed histogram with pure-integer, log-free keys
# ---------------------------------------------------------------------------

QSKETCH_ORACLE = """
WITH v AS (
  SELECT event_type,
         CAST(floor(value * 100) AS BIGINT) AS v100
  FROM events WHERE value > 0
),
keyed AS (
  SELECT event_type,
         CASE WHEN v100 < 8 THEN v100
              ELSE (length(bin(v100)) << 3)
                   | (v100 >> (length(bin(v100)) - 3)) END AS bkt
  FROM v
)
SELECT event_type, CAST(bkt AS BIGINT) AS bkt,
       CAST(count(*) AS BIGINT) AS ct
FROM keyed GROUP BY event_type, bkt
"""


def qsketch_bucket_bounds(bkt: int) -> tuple[float, float]:
    """[lo, hi) of a bucket key in ORIGINAL value units (v100 / 100)."""
    if bkt < 8:
        return bkt / 100.0, (bkt + 1) / 100.0
    octave, top3 = bkt >> 3, bkt & 7
    shift = octave - 3
    return (top3 << shift) / 100.0, ((top3 + 1) << shift) / 100.0


def qsketch_quantile(buckets: dict[int, int], q: float) -> float:
    """Quantile estimate = midpoint of the bucket holding the q-th
    ranked value. Driver-side float; the oracle-checked surface is the
    integer bucket counts."""
    total = sum(buckets.values())
    target = q * total
    seen = 0.0
    for bkt in sorted(buckets):
        seen += buckets[bkt]
        if seen >= target:
            lo, hi = qsketch_bucket_bounds(bkt)
            return (lo + hi) / 2
    lo, hi = qsketch_bucket_bounds(max(buckets))
    return (lo + hi) / 2


@register("ext_quantile_sketch", oracle=QSKETCH_ORACLE)
def ext_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch over `events.value` per event type —
    the DDSketch idea (log-spaced buckets -> bounded RELATIVE error)
    built from pure integer ops so the state is bit-exact
    cross-engine: cents = floor(value*100); bucket = the cents'
    octave (``length(bin(x))`` — bit length, no float log anywhere)
    plus its top-3 mantissa bits, packed as ``(L << 3) | top3``.
    That's <= 1/8 relative bucket width: p50/p95/p99 estimates land
    within ~6% of exact.

    Why a sketch at 100 TB: exact percentiles need a global sort or
    rank; this state is ~500 bytes per group, merges by ADDING bucket
    counts (across partitions, days, or micro-batches — same property
    as the CMS cells), and the quantile read is a driver-side walk.
    One (group, bucket) shuffle with map-side partials, same shape as
    HLL/CMS. The float quantile derivation stays outside the checked
    query (`qsketch_quantile`), accuracy pinned in tests."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value") > 0)
    cents = ev.select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("v100"),
    )
    # shiftleft/shiftright need a column shift amount -> SQL expr (the
    # python helpers only take int literals)
    octave_key = F.expr(
        "shiftleft(CAST(length(bin(v100)) AS BIGINT), 3)"
        " | shiftright(v100, length(bin(v100)) - 3)"
    )
    return (
        cents.select(
            "event_type",
            F.when(F.col("v100") < 8, F.col("v100"))
            .otherwise(octave_key)
            .cast("bigint")
            .alias("bkt"),
        )
        .groupBy("event_type", "bkt")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
