"""Contrastive triplet mining: (anchor, positive, negative) generation.

The training-data generator for embedding/retrieval models (SBERT,
DPR, SimCSE-style contrastive fine-tuning): positives are pairs the
corpus itself certifies as near-duplicates (the SimHash hamming ≤ 3
pairs the dedup family finds — "hard positives" that share most
content), negatives are pseudo-random corpus documents drawn
deterministically per pair.

Determinism contract (shared with the oracle): the negative for pair
(a, b) is the document whose id equals ``h32(a || ':' || b) mod
(max_id + 1)`` — pure data arithmetic, no RNG state. Picks that land
on a non-existent id (sparse id space) or collide with the pair
itself drop the triplet identically in both engines; at corpus scale
the loss is ~|pairs| / |corpus| — negligible, and re-keying with a
salt recovers it if needed.

Scale (100 TB): pair generation is the guarded SimHash blocking; the
negative pick is ONE equi-join of pair-cardinality rows against the
doc-id column (no global sort, no rank window — the modular id IS the
join key); max_id is a 1-row broadcast aggregate.
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
from bigdata_spark_realtime_spark.sources.tables import load_table

TRIPLETS_ORACLE = f"""
WITH pairs AS (
  {SIMHASH_PAIRS_ORACLE}
),
mx AS (SELECT max(doc_id) + 1 AS n FROM documents),
keyed AS (
  SELECT doc_a AS anchor_id, doc_b AS positive_id,
         {H.h32_sql("doc_a::VARCHAR || ':' || doc_b::VARCHAR")} % mx.n
           AS neg_key
  FROM pairs, mx
)
SELECT k.anchor_id, k.positive_id, d.doc_id AS negative_id
FROM keyed k JOIN documents d ON d.doc_id = k.neg_key
WHERE d.doc_id <> k.anchor_id AND d.doc_id <> k.positive_id
"""


@register("ext_contrastive_triplets", oracle=TRIPLETS_ORACLE)
def ext_contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor, positive, negative) triplets: near-dup positives,
    hash-deterministic modular-id negatives."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = simhash_pairs_from(ext_dedup_simhash(spark, sf_dir)).select(
        F.col("doc_a").alias("anchor_id"),
        F.col("doc_b").alias("positive_id"),
    )
    mx = docs.agg((F.max("doc_id") + 1).alias("n"))
    keyed = pairs.crossJoin(F.broadcast(mx)).select(
        "anchor_id",
        "positive_id",
        (
            H.h32(
                F.concat_ws(
                    ":",
                    F.col("anchor_id").cast("string"),
                    F.col("positive_id").cast("string"),
                )
            )
            % F.col("n")
        ).alias("neg_key"),
    )
    neg = docs.select(F.col("doc_id").alias("neg_key"))
    return (
        keyed.join(neg, "neg_key")
        .where(
            (F.col("neg_key") != F.col("anchor_id"))
            & (F.col("neg_key") != F.col("positive_id"))
        )
        .select(
            "anchor_id",
            "positive_id",
            F.col("neg_key").alias("negative_id"),
        )
    )
