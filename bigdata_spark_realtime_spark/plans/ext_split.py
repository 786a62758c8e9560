"""Train/val/test split with a near-dup leakage audit.

Splitting a corpus by hash is easy; the failure mode is SILENT
LEAKAGE: near-duplicate documents landing on opposite sides of the
split, inflating eval scores exactly like external benchmark
contamination does (the within-corpus complement of
`plans/ext_decontam.py`, which checks against an external eval set —
Lee et al. 2022 §5 measure precisely this train/test overlap). This
operator assigns the deterministic 90/5/5 split every engine
reproduces (md5-bucket of doc_id) and reports the near-dup pair matrix
BETWEEN splits: the (train, valid)/(train, test) cells are the leak,
the diagonal is in-split redundancy. Fix = move or drop one member of
each crossing pair before training.

Near-dup pairs come from the SimHash band/verify machinery unchanged
(`plans/ext_dedup.simhash_pairs_from`, hamming ≤ 3 — the same pairs
the dedup family resolves).

Scale (100 TB): the split label is a map-side hash — zero cost; the
pair generation is the guarded SimHash blocking (65 536 keys per band,
bucket-cap fallback); the matrix groupBy runs on pair-cardinality rows
into at most 6 cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.functions import hashing as H
from bigdata_spark_realtime_spark.plans.ext_dedup import (
    SIMHASH_PAIRS_ORACLE,
    ext_dedup_simhash,
    simhash_pairs_from,
)
from bigdata_spark_realtime_spark.plans.registry import register

#: split quota out of 100: <90 train, <95 valid, else test
TRAIN_LT = 90
VALID_LT = 95

_SPLIT_CASE_SQL = f"""
CASE WHEN {H.h32_sql("doc_id::VARCHAR")} % 100 < {TRAIN_LT} THEN 'train'
     WHEN {H.h32_sql("doc_id::VARCHAR")} % 100 < {VALID_LT} THEN 'valid'
     ELSE 'test' END
"""

SPLIT_LEAKAGE_ORACLE = f"""
WITH pairs AS (
  {SIMHASH_PAIRS_ORACLE}
),
sp AS (
  SELECT doc_id, {_SPLIT_CASE_SQL} AS split FROM documents
)
SELECT least(sa.split, sb.split) AS split_a,
       greatest(sa.split, sb.split) AS split_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs
JOIN sp sa ON sa.doc_id = pairs.doc_a
JOIN sp sb ON sb.doc_id = pairs.doc_b
GROUP BY 1, 2
"""


def split_col(doc_id: F.Column) -> F.Column:
    """Deterministic 90/5/5 split bucket of a doc id."""
    bucket = H.h32(doc_id.cast("string")) % 100
    return (
        F.when(bucket < TRAIN_LT, F.lit("train"))
        .when(bucket < VALID_LT, F.lit("valid"))
        .otherwise(F.lit("test"))
    )


@register("ext_split_leakage", oracle=SPLIT_LEAKAGE_ORACLE)
def ext_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair counts per (split, split) cell under the
    deterministic 90/5/5 hash split; off-diagonal cells are eval
    leakage."""
    # the split label is a PURE hash of doc_id (split_col), and every
    # pair endpoint is by construction a documents row — so the oracle's
    # sp joins never drop or change anything. Computing the labels
    # map-side ON the pair rows removes two corpus-cardinality joins
    # (and the second documents scan) from the plan outright
    # (guide §2.4: remove shuffles; r15 optimization round)
    pairs = simhash_pairs_from(ext_dedup_simhash(spark, sf_dir)).select(
        "doc_a", "doc_b"
    )
    return (
        pairs.select(
            split_col(F.col("doc_a")).alias("sa"),
            split_col(F.col("doc_b")).alias("sb"),
        )
        .groupBy(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
