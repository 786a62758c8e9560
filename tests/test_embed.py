"""Engine-independent checks for the embedding-analytics family
(plans/ext_embed.py) — numpy recomputations, a third perspective
beside the two DuckDB oracle mirrors."""

from __future__ import annotations

import math

import numpy as np
import pytest

from bigdata_spark_realtime_spark.plans import ext_embed
from bigdata_spark_realtime_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_np(spark):
    rows = (
        load_table(spark, SF, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float32) for r in rows}
    labels = {r["vec_id"]: r["label"] for r in rows}
    return vecs, labels


def test_quantize_bounds_and_extremes(spark, emb_np):
    vecs, _ = emb_np
    got = ext_embed.ext_embed_quantize_int8(spark, SF).collect()
    assert len(got) == sum(len(v) for v in vecs.values())
    qs = [r["q"] for r in got]
    assert max(qs) <= 127 and min(qs) >= -127
    # the max-abs component of each dim quantizes to exactly +/-127
    mat = np.stack([vecs[k] for k in sorted(vecs)])
    for dim in (0, 31, 63):
        s = np.abs(mat[:, dim]).max()
        extreme = {
            r["q"] for r in got if r["dim"] == dim
            and math.isclose(abs(r["q"]), 127, abs_tol=0)
        }
        assert extreme, f"dim {dim} has no +/-127 despite scale {s}"


def test_centroids_match_numpy_fixed_point(spark, emb_np):
    vecs, labels = emb_np
    got = {
        (r["label"], r["dim"]): (r["centroid_q"], r["n_vectors"])
        for r in ext_embed.ext_embed_centroids(spark, SF).collect()
    }
    by_label: dict[int, list[np.ndarray]] = {}
    for vid, v in vecs.items():
        by_label.setdefault(labels[vid], []).append(v)
    fp = float(ext_embed.FIXED_POINT)

    def trunc_div(s: int, n: int) -> int:
        # Spark DIV / DuckDB `//`: truncate toward zero (NOT Python //)
        return s // n if s >= 0 else -((-s) // n)

    for label, vs in by_label.items():
        vq = np.floor(np.stack(vs).astype(np.float64) * fp).astype(np.int64)
        sums = vq.sum(axis=0)
        n = len(vs)
        for dim in range(vq.shape[1]):
            cq, nv = got[(label, dim)]
            assert nv == n
            assert cq == trunc_div(int(sums[dim]), n)


def test_kmeans_assign_matches_numpy_argmin(spark, emb_np):
    vecs, labels = emb_np
    fp = float(ext_embed.FIXED_POINT)
    vq = {k: np.floor(v.astype(np.float64) * fp).astype(np.int64) for k, v in vecs.items()}
    by_label: dict[int, list[np.ndarray]] = {}
    for vid, q in vq.items():
        by_label.setdefault(labels[vid], []).append(q)
    cents = {}
    for label, qs in by_label.items():
        sums = np.stack(qs).sum(axis=0)
        n = len(qs)
        cents[label] = np.array(
            [int(s // n) if s >= 0 else -((-s) // n) for s in sums], dtype=np.int64
        )
    order = sorted(cents)
    cmat = np.stack([cents[k] for k in order])
    want: dict[tuple[int, int], int] = {}
    for vid, q in vq.items():
        d = ((cmat - q) ** 2).sum(axis=1)
        # argmin with smallest-label tie-break == np.argmin on sorted labels
        to = order[int(np.argmin(d))]
        key = (labels[vid], to)
        want[key] = want.get(key, 0) + 1
    got = {
        (r["label_from"], r["label_to"]): r["n_vectors"]
        for r in ext_embed.ext_kmeans_assign(spark, SF).collect()
    }
    assert got == want
    assert sum(got.values()) == len(vecs)


def test_centroid_similarity_is_symmetric_exact(spark, emb_np):
    got = ext_embed.ext_centroid_similarity(spark, SF).collect()
    pairs = {(r["label_a"], r["label_b"]) for r in got}
    labels = sorted({la for la, _ in pairs} | {lb for _, lb in pairs})
    # strict upper triangle, no dupes, all pairs present
    assert all(la < lb for la, lb in pairs)
    assert len(pairs) == len(labels) * (len(labels) - 1) // 2
