"""Tail-registration shim: approximation-quality audits, part 3 (r14).

Completes the measured-quality family across every approximate
operator class the engine ships. Rounds 13-14 added recall/calibration
audits for LSH candidate generation (MinHash), ANN (IVF cells),
SemDeDup (quantizer gap), and SimHash (token-space hyperplane
calibration); this module covers the three remaining estimators —
composed from the engine's own REGISTERED operators wherever one
already materializes a side of the comparison:

* ``ext_hll_error_audit`` — per group: the HLL estimate the engine
  derives in-plan (`olap_extras.approx_aggregates`, float-free
  linear-counting path included) vs the exact distinct count
  (`ext_sketch.ext_hll_distinct`), with the signed relative error.
  HLL's published guarantee is σ ≈ 1.04/√m ≈ 6.5% at m=256
  (Flajolet et al. 2007) — this audit is the check a production
  deployment publishes against it.
* ``ext_quantile_error_audit`` — the engine's integer-bucket sketch
  median (`approx_aggregates.approx_median_value`) vs the exact
  interpolated median, absolute error. The bucket family guarantees
  ≤ 12.5% relative value error (3-bit mantissa buckets) — measured
  here per group.
* ``ext_srp_error_audit`` — per SRP-LSH candidate pair: signature
  bit-agreement across all SRP_BANDS×SRP_ROWS hyperplanes vs the
  random-hyperplane expectation 1 - θ/π on the exact embedding cosine
  (Charikar 2002) — the embedding-space twin of the token-space
  SimHash calibration (`ext_approx_audit2`), certifying the exact
  integer-projection signatures the SRP near-dup query buckets on.

Registered LAST (splice rule): behind the executed R14 window, the
pre-committed R15 simulation, and the ext_approx_audit2 additions.
All three enter PENDING_FIRST_DRIVER_ROW (seat R16; ≤5/round cap now
fully used: 2 in part 2 + 3 here).

Scale (100 TB): hll/quantile audits run on sketch-cardinality rows
(groups × registers — corpus size governs nothing after the one
sketch-build shuffle each side already pays). The SRP audit joins the
|candidates| pair list (bucket-blocked, never all-pairs) against the
band keys (12 int64s per vector) and the vectors themselves — the
same verify-join shape the production SRP query runs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.functions import hashing as H
from bigdata_spark_realtime_spark.plans.corpus import cosine, emb_double
from bigdata_spark_realtime_spark.plans.ext_sketch import (
    HLL_ORACLE,
    ext_hll_distinct,
)
from bigdata_spark_realtime_spark.plans.ext_srp import (
    SRP_ORACLE,
    srp_band_rows,
)
from bigdata_spark_realtime_spark.plans.olap_extras import (
    APPROX_ORACLE,
    approx_aggregates,
)
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

HLL_ERR_ORACLE = f"""
WITH ap AS ({APPROX_ORACLE}),
hx AS ({HLL_ORACLE})
SELECT ap.event_type,
       ap.approx_users,
       hx.exact_distinct,
       round((ap.approx_users - hx.exact_distinct)::DOUBLE
             / hx.exact_distinct, 6) AS rel_err
FROM ap JOIN hx USING (event_type)
"""


@register("ext_hll_error_audit", oracle=HLL_ERR_ORACLE)
def ext_hll_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL estimate vs exact distinct, per event_type — both sides the
    engine's own registered operators (approx_aggregates derives the
    estimate in-plan; ext_hll_distinct carries the exact count beside
    the sketch state), joined on sketch-cardinality rows."""
    ap = approx_aggregates(spark, sf_dir).select("event_type", "approx_users")
    hx = ext_hll_distinct(spark, sf_dir).select("event_type", "exact_distinct")
    return ap.join(hx, "event_type").select(
        "event_type",
        "approx_users",
        "exact_distinct",
        F.round(
            (F.col("approx_users") - F.col("exact_distinct")).cast("double")
            / F.col("exact_distinct"),
            6,
        ).alias("rel_err"),
    )


QUANT_ERR_ORACLE = f"""
WITH ap AS ({APPROX_ORACLE}),
ex AS (
  SELECT event_type,
         median(CAST(floor(value * 100) AS BIGINT)) / 100.0
           AS exact_median_value
  FROM events WHERE value > 0 GROUP BY event_type
)
SELECT ap.event_type,
       ap.approx_median_value,
       ex.exact_median_value,
       round(abs(ap.approx_median_value - ex.exact_median_value), 4)
         AS abs_err
FROM ap LEFT JOIN ex USING (event_type)
"""


@register("ext_quantile_error_audit", oracle=QUANT_ERR_ORACLE)
def ext_quantile_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-sketch median vs the exact interpolated median of the
    same integer-cent values, per event_type. The exact side
    interpolates halves of BIGINTs — exact in doubles on both engines
    — so abs_err is deterministic."""
    ap = approx_aggregates(spark, sf_dir).select(
        "event_type", "approx_median_value"
    )
    ev = load_table(spark, sf_dir, "events")
    ex = (
        ev.where(F.col("value") > 0)
        .select(
            "event_type",
            F.floor(F.col("value") * 100).cast("bigint").alias("v100"),
        )
        .groupBy("event_type")
        .agg((F.expr("percentile(v100, 0.5)") / 100.0).alias("exact_median_value"))
    )
    return ap.join(ex, "event_type", "left").select(
        "event_type",
        "approx_median_value",
        "exact_median_value",
        F.round(
            F.abs(F.col("approx_median_value") - F.col("exact_median_value")), 4
        ).alias("abs_err"),
    )


_SRP_PLANES = H.SRP_BANDS * H.SRP_ROWS

# reuse the production oracle's integer-projection CTEs (q/sig/bands/
# cand) verbatim by slicing SRP_ORACLE at its final SELECT — a literal
# re-statement would drift the moment the signature definition moves
_SRP_CTE = SRP_ORACLE[: SRP_ORACLE.index("SELECT c.vec_a")]

#: per-vector audit fanout (smallest vec_b win): keeps the calibration
#: sample linear in corpus size — the same quadratic-candidate guard as
#: ext_approx_audit2.AUDIT_FANOUT (random band collisions grow the raw
#: pair list superlinearly; an audit needs a bounded deterministic
#: sample, not every pair)
SRP_AUDIT_FANOUT = 8

SRP_ERR_ORACLE = _SRP_CTE.rstrip() + f""",
capped AS (
  SELECT vec_a, vec_b FROM cand
  QUALIFY row_number() OVER (PARTITION BY vec_a ORDER BY vec_b)
          <= {SRP_AUDIT_FANOUT}
),
agree AS (
  SELECT c.vec_a, c.vec_b,
         CAST(sum(bit_count(xor(a.key, b.key))) AS INT) AS hamming
  FROM capped c
  JOIN bands a ON a.vec_id = c.vec_a
  JOIN bands b ON b.vec_id = c.vec_b AND b.band = a.band
  GROUP BY c.vec_a, c.vec_b
),
scored AS (
  SELECT g.vec_a, g.vec_b, g.hamming,
         round(1.0 - g.hamming::DOUBLE / {_SRP_PLANES}, 4) AS est_agreement,
         list_cosine_similarity(e1.embedding::DOUBLE[],
                                e2.embedding::DOUBLE[]) AS raw_cos
  FROM agree g
  JOIN embeddings e1 ON g.vec_a = e1.vec_id
  JOIN embeddings e2 ON g.vec_b = e2.vec_id
)
SELECT vec_a, vec_b, hamming, est_agreement,
       round(raw_cos, 4) AS exact_cos,
       round(abs(est_agreement
                 - (1.0 - acos(least(greatest(raw_cos, -1.0), 1.0)) / pi())),
             4) AS abs_err
FROM scored
"""


@register("ext_srp_error_audit", oracle=SRP_ERR_ORACLE)
def ext_srp_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP calibration, per bucket-blocked candidate pair: signature
    bit-agreement (over all {bands×rows} integer-projection planes) vs
    the 1 - θ/π hyperplane expectation on the exact embedding cosine.
    The oracle reuses the production query's own signature CTEs, so
    this audits exactly the buckets ext_dedup_embedding_srp pairs on."""
    from pyspark.sql import Window

    from bigdata_spark_realtime_spark.operators.shingling import bucket_pairs

    e = emb_double(load_table(spark, sf_dir, "embeddings"))
    bands = srp_band_rows(e)
    fanout_w = Window.partitionBy("vec_a").orderBy("vec_b")
    cand = (
        bucket_pairs(
            bands.withColumnRenamed("vec_id", "doc_id"), ("band", "key")
        )
        .select(F.col("doc_a").alias("vec_a"), F.col("doc_b").alias("vec_b"))
        .withColumn("rn", F.row_number().over(fanout_w))
        .where(F.col("rn") <= SRP_AUDIT_FANOUT)
        .select("vec_a", "vec_b")
    )
    ka = bands.select(
        F.col("vec_id").alias("vec_a"), "band", F.col("key").alias("key_a")
    )
    kb = bands.select(
        F.col("vec_id").alias("vec_b"), "band", F.col("key").alias("key_b")
    )
    agree = (
        cand.join(ka, "vec_a")
        .join(kb, ["vec_b", "band"])
        .groupBy("vec_a", "vec_b")
        .agg(
            F.sum(F.bit_count(F.col("key_a").bitwiseXOR(F.col("key_b"))))
            .cast("int")
            .alias("hamming")
        )
    )
    e1 = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    e2 = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    raw_cos = cosine(F.col("emb_a"), F.col("emb_b"))
    est = F.round(
        F.lit(1.0) - F.col("hamming").cast("double") / _SRP_PLANES, 4
    )
    pred = F.lit(1.0) - F.acos(
        F.least(F.greatest(raw_cos, F.lit(-1.0)), F.lit(1.0))
    ) / F.lit(math.pi)
    return (
        agree.join(e1, "vec_a")
        .join(e2, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            "hamming",
            est.alias("est_agreement"),
            F.round(raw_cos, 4).alias("exact_cos"),
            F.round(F.abs(est - pred), 4).alias("abs_err"),
        )
    )
