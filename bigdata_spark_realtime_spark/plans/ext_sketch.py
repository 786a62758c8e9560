"""Deterministic mergeable HyperLogLog over the `events` table.

`approx_aggregates` (plans/analytic.py) exposes Spark's built-in
approx_count_distinct, which is rows-only-checked: its HLL++ registers
are engine-internal. This operator is the ORACLE-EXACT sibling — a
hand-rolled HLL (Flajolet et al. 2007) whose register state both
engines derive bit-identically:

- element hash = portable md5-derived h32 (functions/hashing.py);
- bucket = low 8 bits (m = 256 registers), w = high 24 bits;
- rank = leading-zeros(w) + 1 computed as ``25 - length(bin(w))`` —
  both engines' ``bin()`` renders the same minimal binary string, so
  no float ``log2`` is ever taken;
- register = max(rank) per bucket — the max is what makes the sketch
  MERGEABLE: map-side partial maxes combine associatively, which is
  the whole point of a sketch at 100 TB (distinct-count state is 256
  bytes per group, not |distinct| rows);
- the harmonic-mean denominator is kept integer: ``sum_scaled =
  Σ 2^(50−reg)`` over all 256 registers (absent buckets count as
  reg = 0), computed with integer shifts. Max term 2^50, 256 terms
  < 2^58 — safely inside int64.

The float HLL estimate ``α·m²/Σ2^(−reg)`` is deliberately NOT a query
column (the α multiply/divide would reintroduce cross-engine float
drift); it is derived from sum_scaled in one driver-side expression,
and its accuracy against the exact count is pinned by
tests/test_ext_corpus_ops.py. The query emits the integer sketch state
plus the exact distinct count for side-by-side comparison.

Scale (100 TB): one shuffle on (group, bucket) with map-side partial
max — the classic sketch shape; the exact count_distinct column is for
test-scale verification and would be dropped in production (it is the
expensive thing the sketch replaces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.functions import hashing as H
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: registers (m); 8-bit bucket index
M = 256
#: integer scale exponent for the harmonic denominator
S = 50

HLL_ORACLE = f"""
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
         CAST(sum(1::BIGINT << ({S} - reg)) AS BIGINT) AS sum_present,
         count(*) AS n_buckets
  FROM regs GROUP BY event_type
),
ex AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT st.event_type,
       CAST(st.sum_present
            + ({M} - st.n_buckets) * (1::BIGINT << {S}) AS BIGINT)
         AS hll_sum_scaled,
       CAST(st.n_buckets AS BIGINT) AS hll_nonzero_regs,
       ex.exact_distinct
FROM st JOIN ex USING (event_type)
"""


def hll_estimate(sum_scaled: int, nonzero_regs: int) -> float:
    """HLL estimate from the integer sketch state with the standard
    small-range linear-counting correction (Flajolet §4: when the raw
    estimate is below 2.5·m and empty registers remain, ``m·ln(m/V)``
    over V zero registers is the unbiased estimator). Driver-side —
    deliberately outside the oracle-checked query; see module doc."""
    import math

    alpha = 0.7213 / (1 + 1.079 / M)
    raw = alpha * M * M * (1 << S) / sum_scaled
    zeros = M - nonzero_regs
    if raw <= 2.5 * M and zeros > 0:
        return M * math.log(M / zeros)
    return raw


@register("ext_hll_distinct", oracle=HLL_ORACLE)
def ext_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: integer HLL sketch state (256 registers folded
    to the scaled harmonic denominator) beside the exact distinct
    user count."""
    ev = load_table(spark, sf_dir, "events")
    hv = H.h32(F.col("user_id").cast("string"))
    w = F.expr(f"hv DIV {M}")
    rank = F.when(w == 0, 25).otherwise(25 - F.length(F.bin(w)))
    ranked = ev.select("event_type", hv.alias("hv")).select(
        "event_type", F.expr(f"hv % {M}").alias("bucket"), rank.alias("rank")
    )
    regs = ranked.groupBy("event_type", "bucket").agg(F.max("rank").alias("reg"))
    st = regs.groupBy("event_type").agg(
        # SQL shiftleft takes a column shift amount (the python
        # F.shiftleft helper only accepts an int literal)
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {S} - reg)")).alias(
            "sum_present"
        ),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    ex = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return st.join(ex, "event_type").select(
        "event_type",
        (
            F.col("sum_present")
            + (F.lit(M) - F.col("n_buckets")) * F.lit(1 << S)
        ).cast("long").alias("hll_sum_scaled"),
        F.col("n_buckets").cast("long").alias("hll_nonzero_regs"),
        "exact_distinct",
    )


# ---------------------------------------------------------------------------
# Count-Min Sketch over document token frequencies
# ---------------------------------------------------------------------------

#: CMS geometry: D independent hash rows × W counters
CMS_D = 4
CMS_W = 64
#: fixed probe tokens (drawn from the synthetic vocab so every SF has
#: real counts to compare against)
CMS_PROBES = (
    "spark", "table", "join", "window", "customer",
    "query", "hash", "order", "scan", "value",
)

_PROBE_SQL = " UNION ALL ".join(
    f"SELECT '{t}' AS token" for t in CMS_PROBES
)


def _cms_hash_sql(d: int, token_expr: str) -> str:
    """Row-d bucket of a token: h32('cms{d}|' || token) % W."""
    keyed = f"'cms{d}|' || {token_expr}"
    return f"{H.h32_sql(keyed)} % {CMS_W}"


_CMS_ROWS_SQL = " UNION ALL ".join(
    f"SELECT {d} AS d, {_cms_hash_sql(d, 'token')} AS w, cnt FROM tokc"
    for d in range(CMS_D)
)

CMS_ORACLE = f"""
WITH tokc AS (
  SELECT token, count(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token
),
cms AS (
  SELECT d, w, CAST(sum(cnt) AS BIGINT) AS c
  FROM ({_CMS_ROWS_SQL})
  GROUP BY d, w
),
probes AS ({_PROBE_SQL}),
est AS (
  SELECT p.token,
         min(cms.c) AS est_count
  FROM probes p
  JOIN cms ON ({" OR ".join(f"(cms.d = {d} AND cms.w = {_cms_hash_sql(d, 'p.token')})" for d in range(CMS_D))})
  GROUP BY p.token
),
ex AS (
  SELECT p.token, COALESCE(t.cnt, 0) AS exact_count
  FROM probes p LEFT JOIN tokc t USING (token)
)
SELECT ex.token, CAST(est.est_count AS BIGINT) AS est_count, ex.exact_count
FROM ex JOIN est USING (token)
"""


@register("ext_cms_freq", oracle=CMS_ORACLE)
def ext_cms_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch (Cormode & Muthukrishnan 2005) over document
    token frequencies: D=4 hash rows × W=64 counters, probe-token
    estimates beside exact counts.

    CMS is the frequency-sketch sibling of the HLL above and the
    easiest of all sketches to verify cross-engine: every cell is an
    integer SUM (mergeable by plain addition — partials from any
    partitioning combine exactly) and the point estimate is an integer
    MIN over D cells, so the oracle matches bit-for-bit with no float
    anywhere. The estimate over-counts, never under-counts
    (est ≥ exact always — pinned in tests).

    Scale (100 TB): the kernel-side shape aggregates per-token counts
    first (one shuffle of the vocabulary-sized token counts — already
    required by any df/tf computation and shared with tf-idf/BM25),
    then folds them into D×W = 256 cells; the sketch table itself is
    256 rows regardless of corpus size, and production would maintain
    it incrementally by adding per-batch partial sketches."""
    docs = load_table(spark, sf_dir, "documents")
    tokc = (
        docs.select(F.explode(F.split("text", " ", -1)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rows = None
    for d in range(CMS_D):
        bucket = H.h32(F.concat(F.lit(f"cms{d}|"), F.col("token"))) % CMS_W
        part = tokc.select(
            F.lit(d).alias("d"), bucket.alias("w"), F.col("cnt")
        )
        rows = part if rows is None else rows.unionByName(part)
    cms = rows.groupBy("d", "w").agg(F.sum("cnt").alias("c"))

    probes = spark.createDataFrame(
        [(t,) for t in CMS_PROBES], "token string"
    )
    probe_cells = None
    for d in range(CMS_D):
        bucket = H.h32(F.concat(F.lit(f"cms{d}|"), F.col("token"))) % CMS_W
        part = probes.select(
            "token", F.lit(d).alias("d"), bucket.alias("w")
        )
        probe_cells = part if probe_cells is None else probe_cells.unionByName(part)
    est = (
        probe_cells.join(F.broadcast(cms), ["d", "w"])
        .groupBy("token")
        .agg(F.min("c").alias("est_count"))
    )
    # filter the vocabulary-sized counts down to the probe set BEFORE
    # joining: the IN-literal predicate pushes through the aggregation
    # to the scan, and the ≤|probes|-row result broadcasts — a plain
    # probes-LEFT-JOIN-tokc would SortMergeJoin the whole vocabulary
    probe_counts = tokc.where(F.col("token").isin(list(CMS_PROBES)))
    ex = probes.join(F.broadcast(probe_counts), "token", "left").select(
        "token", F.coalesce("cnt", F.lit(0)).alias("exact_count")
    )
    return ex.join(F.broadcast(est), "token").select(
        "token", "est_count", "exact_count"
    )
