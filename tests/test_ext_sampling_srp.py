"""Tests for the sampling operators and SRP embedding LSH.

Cross-engine equivalence (Spark vs DuckDB oracle) is covered for all
three registered queries by tests/test_queries_oracle.py; here we pin
the *semantic contracts*: rate accuracy and determinism for the
samplers, signature correctness and planted-near-dup recall for SRP.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from bigdata_spark_realtime_spark.functions import hashing as H
from bigdata_spark_realtime_spark.plans.ext_sampling import (
    DEFAULT_RATE,
    SAMPLE_MOD,
    SOURCE_CAP,
    STRATA_RATES,
    ext_sample_source_cap,
    ext_sample_stratified,
)
from bigdata_spark_realtime_spark.plans.ext_srp import srp_band_rows


def test_stratified_rates_and_determinism(spark, sf_dir, duck):
    got = ext_sample_stratified(spark, sf_dir).toPandas()
    totals = duck.sql("SELECT lang, count(*) n FROM documents GROUP BY 1").df()
    totals = dict(zip(totals["lang"], totals["n"]))
    kept = got.groupby("lang")["doc_id"].count().to_dict()
    for lang, n_total in totals.items():
        rate = STRATA_RATES.get(lang, DEFAULT_RATE) / SAMPLE_MOD
        n_kept = kept.get(lang, 0)
        # binomial 4-sigma envelope around the target rate
        sigma = math.sqrt(n_total * rate * (1 - rate))
        assert abs(n_kept - n_total * rate) <= 4 * sigma + 1, (
            lang,
            n_kept,
            n_total,
            rate,
        )
    # hash-deterministic: a second run returns the identical sample
    again = ext_sample_stratified(spark, sf_dir).toPandas()
    assert sorted(got["doc_id"]) == sorted(again["doc_id"])
    # every decision is reproducible from the row itself
    assert (got["sample_bucket"] < SAMPLE_MOD).all()


def test_source_cap_quota(spark, sf_dir):
    got = ext_sample_source_cap(spark, sf_dir).toPandas()
    per_source = got.groupby("source")["doc_id"].count()
    assert (per_source <= SOURCE_CAP).all()
    # the kept set is unique and deterministic
    assert got["doc_id"].is_unique
    again = ext_sample_source_cap(spark, sf_dir).toPandas()
    assert sorted(got["doc_id"]) == sorted(again["doc_id"])


def _python_band_keys(mat: np.ndarray) -> np.ndarray:
    """Pure-python/numpy reference for the SRP band keys."""
    w = np.array(H.SRP_W, dtype=np.int64)
    qe = np.floor(mat.astype("float64") * H.SRP_SCALE).astype("int64")
    bits = (qe @ w.T >= 0).astype("int64")
    keys = np.zeros((len(mat), H.SRP_BANDS), dtype="int64")
    for b in range(H.SRP_BANDS):
        for r in range(H.SRP_ROWS):
            keys[:, b] = keys[:, b] * 2 + bits[:, b * H.SRP_ROWS + r]
    return keys


def test_srp_signatures_match_reference(spark, sf_dir):
    """The distributed mapInPandas signature equals a single-process
    reference computation on the same vectors (exact — integer SRP has
    no summation-order jitter)."""
    import pyarrow.parquet as pq

    from bigdata_spark_realtime_spark.sources.tables import load_table

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    ref = _python_band_keys(np.stack(tbl["embedding"].to_numpy()))
    want = {
        (int(vid), b, int(ref[i, b]))
        for i, vid in enumerate(tbl["vec_id"])
        for b in range(H.SRP_BANDS)
    }
    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        (r["vec_id"], r["band"], r["key"])
        for r in srp_band_rows(emb).collect()
    }
    assert got == want


@pytest.mark.parametrize("target_cos,min_recall", [(0.98, 0.9), (0.95, 0.75)])
def test_srp_planted_neardup_recall(spark, target_cos, min_recall):
    """Planted near-dups at a known cosine must surface as SRP bucket
    collisions at >= the banding formula's recall (1-(1-p^16)^12 with
    p = 1 - arccos(s)/pi: ≈0.994 at s=0.98, ≈0.91 at s=0.95)."""
    from bigdata_spark_realtime_spark.plans.ext_dedup import _bucket_pairs

    rng = np.random.default_rng(7)
    n_pairs = 60
    base = rng.normal(size=(n_pairs, H.EMB_DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # rotate each vector by exactly arccos(target_cos) in a random plane
    noise = rng.normal(size=(n_pairs, H.EMB_DIM))
    noise -= (noise * base).sum(axis=1, keepdims=True) * base
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    theta = math.acos(target_cos)
    dup = math.cos(theta) * base + math.sin(theta) * noise

    rows = []
    for i in range(n_pairs):
        rows.append((2 * i, [float(x) for x in base[i]]))
        rows.append((2 * i + 1, [float(x) for x in dup[i]]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cand = _bucket_pairs(
        srp_band_rows(emb).withColumnRenamed("vec_id", "doc_id"),
        ("band", "key"),
    ).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in cand}
    hits = sum((2 * i, 2 * i + 1) in found for i in range(n_pairs))
    assert hits >= min_recall * n_pairs, (hits, n_pairs)
