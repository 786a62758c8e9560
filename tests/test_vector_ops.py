"""Vectorized (numpy) vector ops agree with the exact JVM fold forms,
and are the faster path at scale."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.operators.vector_ops import (
    neardup_pairs_blocked,
    topk_neighbors_blocked,
)
from bigdata_spark_realtime_spark.plans.ext_dedup import cosine, emb_double
from bigdata_spark_realtime_spark.sources.tables import load_table

THRESHOLD = 0.35


def test_blocked_neardup_equals_fold(spark, sf_dir):
    emb = emb_double(load_table(spark, sf_dir, "embeddings"))
    a = emb.select(
        F.col("label").alias("la"), F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
    )
    b = emb.select(
        F.col("label").alias("lb"), F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")
    )
    fold = (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("vec_a") < F.col("vec_b")))
        .select(
            "vec_a", "vec_b", F.round(cosine(F.col("ea"), F.col("eb")), 4).alias("cos_sim")
        )
        .where(F.col("cos_sim") >= THRESHOLD)
    )
    blocked = neardup_pairs_blocked(emb, THRESHOLD)
    f = {(r.vec_a, r.vec_b): r.cos_sim for r in fold.collect()}
    g = {(r.vec_a, r.vec_b): r.cos_sim for r in blocked.collect()}
    assert f.keys() == g.keys() and len(f) > 0
    for k in f:
        assert abs(f[k] - g[k]) <= 1e-4, (k, f[k], g[k])


def test_blocked_topk_matches_bucketed_query(spark, sf_dir):
    from bigdata_spark_realtime_spark.plans.ext_similarity import (
        TOP_K,
        ext_ann_bucketed_topk,
    )

    emb = emb_double(load_table(spark, sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") < 10)
    got = topk_neighbors_blocked(emb, queries, TOP_K)
    want = ext_ann_bucketed_topk(spark, sf_dir)
    g = {(r.query_id, r.neighbor_id) for r in got.collect()}
    w = {(r.query_id, r.neighbor_id) for r in want.collect()}
    # identical neighbor sets modulo equal-similarity rank ties
    assert len(g) == len(w)
    assert len(g & w) / len(w) >= 0.9


def test_blocked_is_faster_at_scale(spark):
    emb = emb_double(load_table(spark, '/root/testdata/sf0.1', "embeddings"))
    t0 = time.time()
    n_blocked = neardup_pairs_blocked(emb, THRESHOLD).count()
    blocked_s = time.time() - t0
    assert n_blocked > 0
    # generous bound: the vectorized path finishes well under the ~6 s the
    # interpreted fold needs for the same 1.25M pairs
    assert blocked_s < 5, f"blocked path took {blocked_s:.1f}s"
