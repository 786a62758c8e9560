"""Multimodal binary-column plumbing: schemas, batch shapes, determinism."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.operators.multimodal import (
    documents_as_media,
    extract_media_meta,
    sample_frames,
)
from bigdata_spark_realtime_spark.sources.tables import load_table


def test_media_meta_schema_and_determinism(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents")).limit(50)
    meta = extract_media_meta(media)
    assert [f.name for f in meta.schema] == [
        "media_id", "kind", "n_bytes", "checksum", "width", "height",
    ]
    rows1 = {r.media_id: r for r in meta.collect()}
    rows2 = {r.media_id: r for r in extract_media_meta(media).collect()}
    assert rows1.keys() == rows2.keys()
    for k in rows1:
        assert tuple(rows1[k]) == tuple(rows2[k])
    # checksum really is md5 of the payload bytes
    src = {r.media_id: r.payload for r in media.collect()}
    for mid, row in rows1.items():
        assert row.checksum == hashlib.md5(bytes(src[mid])).hexdigest()
        assert row.n_bytes == len(src[mid])
        assert 64 <= row.width < 128 and 64 <= row.height < 128


def test_frame_sampling_one_to_n(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents")).limit(20)
    frames = sample_frames(media, every_n_bytes=100)
    pdf = frames.toPandas()
    n_bytes = {r.media_id: len(r.payload) for r in media.collect()}
    counts = pdf.groupby("media_id").size().to_dict()
    for mid, n in n_bytes.items():
        assert counts[mid] == max(1, n // 100)
    # frame indexes are dense from 0
    for mid, grp in pdf.groupby("media_id"):
        assert sorted(grp.frame_idx) == list(range(len(grp)))


def test_resize_payload_bounded_and_deterministic(spark, sf_dir):
    from bigdata_spark_realtime_spark.operators.multimodal import (
        documents_as_media,
        resize_media,
    )
    from bigdata_spark_realtime_spark.sources.tables import load_table

    media = documents_as_media(load_table(spark, sf_dir, "documents")).limit(20)
    out = resize_media(media, width=8, height=4).collect()
    assert all(len(r.payload) == 8 * 4 for r in out)
    assert all((r.width, r.height) == (8, 4) for r in out)
    # deterministic: same input -> same thumbnail bytes
    again = {r.media_id: r.payload for r in resize_media(media, 8, 4).collect()}
    assert {r.media_id: r.payload for r in out} == again


def test_int_feature_projection_is_content_sensitive():
    """The gate featurizer must be a function of DECODED content: same
    pixels → same projection regardless of encoding; one changed byte →
    a different projection (byte-fold stubs fail the first property on
    re-encodes; constant fakes fail the second)."""
    import numpy as np

    from bigdata_spark_realtime_spark.operators.multimodal import (
        FEATURE_DIM,
        _sign_matrix,
        int_feature_projection,
        proj_hash,
    )

    signs = np.asarray(_sign_matrix(FEATURE_DIM))
    assert signs.shape == (FEATURE_DIM, 256)
    assert set(np.unique(signs)) == {-1, 1}

    content = bytes(range(256)) * 4
    p1 = int_feature_projection(content)
    assert len(p1) == FEATURE_DIM and all(isinstance(x, int) for x in p1)
    # histogram-based: a permutation of the same bytes projects equal
    assert int_feature_projection(content[::-1]) == p1
    # one substituted byte moves two histogram bins -> projection changes
    mutated = b"\xff" + content[1:]
    assert int_feature_projection(mutated) != p1
    assert proj_hash(p1) != proj_hash(int_feature_projection(mutated))


def test_projected_features_match_decoded_content(spark):
    """Executor-side extract_features_projected over ENCODED fixtures
    equals the projection of the PRE-encode arrays (the truth file) —
    the decode+featurize round trip the gate oracle checks."""
    import json
    import os

    from bigdata_spark_realtime_spark.operators.multimodal import (
        extract_features_projected,
    )
    from bigdata_spark_realtime_spark.plans.ext_multimodal import (
        ensure_media_fixtures,
    )

    base = ensure_media_fixtures()
    media = spark.read.parquet(os.path.join(base, "media.parquet"))
    got = {r.media_id: r.proj_hash for r in extract_features_projected(media).collect()}
    with open(os.path.join(base, "media_truth.jsonl")) as f:
        truth = {r["media_id"]: r["proj_hash"] for r in map(json.loads, f)}
    assert got == truth


def test_extract_features_feeds_ann_contract(spark, sf_dir):
    import math

    from bigdata_spark_realtime_spark.operators.multimodal import (
        FEATURE_DIM,
        documents_as_media,
        extract_features,
    )
    from bigdata_spark_realtime_spark.sources.tables import load_table

    media = documents_as_media(load_table(spark, sf_dir, "documents")).limit(50)
    rows = extract_features(media).collect()
    assert all(len(r.features) == FEATURE_DIM for r in rows)
    # L2-normalized (or all-zero for empty payloads)
    for r in rows:
        n = math.sqrt(sum(x * x for x in r.features))
        assert n == 0.0 or abs(n - 1.0) < 1e-5
    # the array<float> output slots into the blocked-cosine near-dup
    # operator exactly like the embeddings table does
    from bigdata_spark_realtime_spark.operators.vector_ops import (
        neardup_pairs_blocked,
    )
    from pyspark.sql import functions as F

    feats = extract_features(media).select(
        F.col("media_id").alias("vec_id"),
        F.lit("all").alias("label"),
        F.col("features").alias("embedding"),
    )
    pairs = neardup_pairs_blocked(feats, threshold=0.999)
    assert pairs.columns == ["vec_a", "vec_b", "cos_sim"]
    pairs.count()  # executes the applyInPandas path


def test_phash64_properties():
    """Pure-function contract: identical pixels -> hamming 0; an
    inverted image flips (nearly) every bit; tiny perturbation moves
    few bits. All integer arithmetic, so results are exact."""
    import random

    from bigdata_spark_realtime_spark.operators.multimodal import phash64

    rng = random.Random(7)
    w, h, ch = 24, 16, 3
    pixels = bytes(rng.randrange(256) for _ in range(w * h * ch))
    ph = phash64(pixels, w, h, ch)
    assert phash64(pixels, w, h, ch) == ph
    inverted = bytes(255 - b for b in pixels)
    ham_inv = bin((ph ^ phash64(inverted, w, h, ch)) & (2**64 - 1)).count("1")
    assert ham_inv >= 48  # inversion flips the bright/dark structure
    buf = bytearray(pixels)
    buf[10] = min(255, buf[10] + 1)
    ham_tiny = bin((ph ^ phash64(bytes(buf), w, h, ch)) & (2**64 - 1)).count("1")
    assert ham_tiny <= 2


def test_phash_pairs_find_planted_neardups(spark):
    """The fixture generator plants n_neardup perturbed copies; the
    banded pair query must find exactly the original<->copy pairs,
    each within the hamming budget, with zero false positives among
    the random originals (their hashes are ~32 bits apart)."""
    from bigdata_spark_realtime_spark.plans.ext_multimodal import (
        ext_multimodal_phash_pairs,
    )

    rows = ext_multimodal_phash_pairs(spark, "/root/testdata/sf0.001").collect()
    got = {(r["media_a"], r["media_b"]): r["hamming"] for r in rows}
    # ids: originals 0..29, audio 30..59, replicas 60..67 (copy k of k)
    want_pairs = {(k, 60 + k) for k in range(8)}
    assert set(got) == want_pairs
    assert all(h <= 3 for h in got.values())


def test_audiohash64_properties():
    """PCM fingerprint contract: deterministic; doubling amplitude
    leaves the signature unchanged (scale-free threshold); a tiny
    amplitude nudge moves few bits."""
    import random

    import numpy as np

    from bigdata_spark_realtime_spark.operators.multimodal import audiohash64

    rng = random.Random(11)
    samples = np.array(
        [rng.randint(-3000, 3000) for _ in range(1000)], dtype="<i2"
    )
    ah = audiohash64(samples.tobytes())
    assert audiohash64(samples.tobytes()) == ah
    doubled = (samples.astype(np.int32) * 2).clip(-32768, 32767).astype("<i2")
    assert audiohash64(doubled.tobytes()) == ah  # energy RATIOS unchanged
    nudged = samples.copy()
    nudged[100] += 1
    ham = bin((ah ^ audiohash64(nudged.tobytes())) & (2**64 - 1)).count("1")
    assert ham <= 2


def test_audiohash_pairs_find_planted_neardups(spark):
    """ids: audio originals 30..59, audio replicas 68..75 (copy k of
    30+k): exactly the planted pairs, all within the hamming budget."""
    from bigdata_spark_realtime_spark.plans.ext_multimodal import (
        ext_multimodal_audiohash_pairs,
    )

    rows = ext_multimodal_audiohash_pairs(
        spark, "/root/testdata/sf0.001"
    ).collect()
    got = {(r["media_a"], r["media_b"]): r["hamming"] for r in rows}
    assert set(got) == {(30 + k, 68 + k) for k in range(8)}
    assert all(h <= 3 for h in got.values())


def test_scene_cuts_match_truth_recomputation(spark):
    """Independent numpy replay of the cut rule over the generator's
    ground-truth luma sums must equal the Spark answer exactly, and
    multi-scene clips must show at least one cut."""
    import json
    import os

    from bigdata_spark_realtime_spark.plans.ext_multimodal import (
        MEDIA_BASE,
        SCENE_CUT_THRESHOLD,
        ensure_media_fixtures,
        ext_multimodal_scene_cuts,
    )

    ensure_media_fixtures()
    truth = [
        json.loads(l)
        for l in open(os.path.join(MEDIA_BASE, "video_truth.jsonl"))
    ]
    by_clip: dict[int, list[dict]] = {}
    for r in truth:
        by_clip.setdefault(r["media_id"], []).append(r)
    want = set()
    for mid, rows in by_clip.items():
        rows.sort(key=lambda r: r["frame_idx"])
        for prev, cur in zip(rows, rows[1:]):
            lhs = abs(
                cur["luma_sum"] * prev["n_pix"]
                - prev["luma_sum"] * cur["n_pix"]
            )
            if lhs > SCENE_CUT_THRESHOLD * cur["n_pix"] * prev["n_pix"]:
                want.add((mid, cur["frame_idx"]))
    got = {
        (r["media_id"], r["cut_frame"])
        for r in ext_multimodal_scene_cuts(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert got == want
    assert want, "fixtures must plant at least one multi-scene clip"
