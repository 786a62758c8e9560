"""Exact set-similarity self-join via prefix filtering (PPJoin family).

The MinHash-LSH path (`plans/ext_dedup.py`) is probabilistic: its
candidate recall is 1-(1-s^4)^16 — excellent, but not 1. This operator
is the EXACT counterpart: every document pair whose 3-token-shingle
Jaccard is >= τ (τ = 3/5 here, all arithmetic integer) is returned,
guaranteed, with no all-pairs product anywhere. Public algorithm:
SSJoin/PPJoin prefix filtering (Chaudhuri et al., ICDE 2006; Xiao et
al., WWW 2008) — order every set by ascending document frequency
(rarest first), keep only each set's first ``p = s - ceil(τ·s) + 1``
elements as its *prefix*; any pair with Jaccard >= τ must share at
least one prefix element (|∩| >= τ·|∪| >= τ·|a| implies the first
``|a| - ceil(τ|a|) + 1`` elements of ``a`` under ANY fixed total order
cannot all miss ``b``, and symmetrically). Candidates = pairs sharing
a prefix shingle; exact verification touches only those.

Scale (100 TB): df ordering makes the candidate join skew-resistant BY
DESIGN — high-frequency (boilerplate) shingles sort to the END of each
set and therefore almost never enter a prefix; prefix buckets are
dominated by df≈1 shingles. The residual degenerate bucket (a corpus
of identical documents) takes the same guarded expansion as the LSH
path (`_bucket_pairs`, `plans/ext_dedup.py:160` — collect_list for
small buckets, AQE-split equi-join for oversize ones, nothing ever
truncated). Total-order choice only affects candidate-set SIZE, never
completeness, so there is no cross-engine ordering contract to keep —
the oracle is the full token-join, and the hash match PROVES the
prefix filter lost nothing. Shuffles: shingle explode → df count →
per-doc prefix window → bucket join → verify; every key is a shingle
or a doc id, every payload is ids + one array per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.operators.shingling import H
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: Jaccard threshold as an exact rational (integer cross-multiplication
#: on both engines — no float ceil/compare anywhere)
TAU_NUM, TAU_DEN = 3, 5

SETSIM_ORACLE = f"""
WITH sh AS MATERIALIZED (
  SELECT doc_id, list_distinct({H.shingles_sql('toks')}) AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
  WHERE len(toks) >= {H.SHINGLE_W}
),
toks AS (SELECT doc_id, unnest(shingles) AS tok FROM sh),
sz AS (SELECT doc_id, len(shingles) AS s FROM sh),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS inter_sz
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b, p.inter_sz,
       CAST(sa.s + sb.s - p.inter_sz AS BIGINT) AS union_sz,
       CAST(p.inter_sz AS DOUBLE) / (sa.s + sb.s - p.inter_sz) AS jaccard
FROM pairs p
JOIN sz sa ON p.doc_a = sa.doc_id
JOIN sz sb ON p.doc_b = sb.doc_id
WHERE {TAU_DEN} * p.inter_sz >= {TAU_NUM} * (sa.s + sb.s - p.inter_sz)
"""


def setsim_join(
    sets: DataFrame, tau_num: int = TAU_NUM, tau_den: int = TAU_DEN
) -> DataFrame:
    """All (doc_a < doc_b) pairs with |∩|/|∪| >= tau_num/tau_den over a
    ``(doc_id, shingles array)`` frame — prefix-filter candidates, exact
    verify. Complete for any 0 < τ <= 1 (unit-tested against brute
    force on adversarial synthetic sets)."""
    from bigdata_spark_realtime_spark.plans.ext_dedup import _bucket_pairs

    toks = sets.select("doc_id", F.explode("shingles").alias("tok"))
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # global total order = (df asc, tok asc); per-doc rank under it
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    ranked = (
        toks.join(dfreq, "tok")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("s", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    )
    # p = s - ceil(τ·s) + 1, all integer: ceil(n·s/d) = (n·s + d - 1) div d
    p = F.col("s") - ((F.lit(tau_num) * F.col("s") + (tau_den - 1)) / tau_den).cast(
        "int"
    ) + 1
    prefix = ranked.where(F.col("rn") <= p).select("tok", "doc_id")
    cand = _bucket_pairs(prefix, ("tok",))

    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        F.size("shingles").alias("s_a"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        F.size("shingles").alias("s_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint")
    union = (F.col("s_a") + F.col("s_b")).cast("bigint") - inter
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("inter_sz"),
            union.alias("union_sz"),
            (inter.cast("double") / union).alias("jaccard"),
        )
        .where(F.lit(tau_den) * F.col("inter_sz") >= F.lit(tau_num) * F.col("union_sz"))
    )


@register("ext_setsim_join", oracle=SETSIM_ORACLE)
def ext_setsim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVERY document pair with shingle-Jaccard >= 3/5 — exact, complete
    (prefix-filter candidates + exact verify), vs the full token-join
    oracle. The guaranteed-recall sibling of `ext_dedup_minhash_lsh`."""
    from bigdata_spark_realtime_spark.plans.ext_dedup import _shingle_sets

    return setsim_join(_shingle_sets(spark, sf_dir))
