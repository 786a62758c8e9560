"""Round-15 optimization-round property pins.

The r15 optimization round rewrote the per-row Python kernels to
batch-factorized form (operators/shingling.py, plans/ext_quality.py,
plans/ext_lm.py, plans/ext_curation3.py) and replaced the graph
family's self-join pair expansion with an array-side transform
(plans/ext_funnel._cooc_capped_pairs). Every rewrite must be
BIT-IDENTICAL to the shape it replaced — these tests pin each one
against a direct re-implementation of the old per-row arithmetic, so
a future refactor cannot silently change semantics while keeping the
oracle sweep green by luck of the fixture.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from bigdata_spark_realtime_spark.functions import hashing as H
from bigdata_spark_realtime_spark.operators import shingling as S

TEXTS = [
    "hello world hello world again",
    "a b c a b c a",
    "",
    "single",
    "x " * 60 + "y",
    "unicode ünïcödé tøken ünïcödé tøken",
    "the quick brown fox jumps over the lazy dog",
    " leading and  double  spaces ",
]


def _old_h32(strings):
    return np.fromiter(
        (int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in strings),
        np.int64,
        len(strings),
    )


def test_h32_gathered_matches_hexdigest_path():
    # below and above the 64-element factorize cutoff
    small = ["a", "b", "a"]
    big = [f"w{i % 7}" for i in range(300)]
    for ss in (small, big, []):
        assert (S._h32_gathered(ss) == _old_h32(ss)).all()


def test_factorize_pairs_does_not_conflate_tuples():
    # a joined-string encoding would conflate these two bigrams; the
    # object-array factorizer must keep them distinct
    pairs = [("a\x00", "b"), ("a", "\x00b"), ("a\x00", "b")]
    codes, uniq = S._factorize_pairs(pairs)
    assert len(uniq) == 2
    assert codes[0] == codes[2] != codes[1]


def _old_simhash(text):
    toks = ("" if text is None else text).split(" ")
    digs = [hashlib.md5(t.encode()).hexdigest() for t in toks]
    lo = np.fromiter((int(d[:8], 16) for d in digs), np.int64, len(digs))
    hi = np.fromiter((int(d[8:16], 16) for d in digs), np.int64, len(digs))
    contrib = np.concatenate(
        [
            ((lo[:, None] >> S._SHIFTS) & 1) * 2 - 1,
            ((hi[:, None] >> S._SHIFTS) & 1) * 2 - 1,
        ],
        axis=1,
    )
    sums = contrib.sum(axis=0)
    pos = sums > 0
    v = (pos[:63] * S._COMBINE_W).sum(dtype=np.int64)
    return int(v + (S._SIGN_BIT if pos[63] else np.int64(0)))


@pytest.mark.parametrize("vocab_cutoff", [0, 2048])
def test_simhash_kernel_both_paths_match_reference(spark, vocab_cutoff, monkeypatch):
    # cutoff 0 forces the gather+reduceat path; 2048 the counts@contrib
    # path (the fixture vocab is far below it) — both must agree with
    # the per-row reference arithmetic
    monkeypatch.setattr(S, "_COUNTS_MATMUL_MAX_VOCAB", vocab_cutoff)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)] + [(99, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["simhash"]
        for r in S.simhash_fingerprints(docs).collect()
    }
    assert 99 not in got  # NULL text drops, as before
    for i, t in enumerate(TEXTS):
        assert got[i] == _old_simhash(t), (i, t)


def test_minhash_signatures_match_per_occurrence_arithmetic(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in S.minhash_signatures(docs).collect()}
    A = np.array(H.MINHASH_A, dtype=np.int64).reshape(-1, 1)
    B = np.array(H.MINHASH_B, dtype=np.int64).reshape(-1, 1)
    for i, t in enumerate(TEXTS):
        toks = t.split(" ")
        sh = [" ".join(toks[j : j + H.SHINGLE_W]) for j in range(len(toks) - H.SHINGLE_W + 1)]
        if not sh:
            assert i not in rows
            continue
        hs = _old_h32(sh) % H.P
        sig = (A * hs + B) % H.P
        mins = sig.min(axis=1)
        for j in range(H.K):
            assert rows[i][f"m{j}"] == mins[j], (i, j)


def test_classifier_kernel_matches_per_row_reference(spark, sf_dir):
    from bigdata_spark_realtime_spark.plans.ext_quality import (
        CLF_BUCKETS,
        CLF_W,
        ext_quality_classifier,
    )

    got = {
        r["doc_id"]: r
        for r in ext_quality_classifier(spark, sf_dir).collect()
    }
    w = np.array(CLF_W, dtype=np.int64)
    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert len(got) == int(pdf["text"].notna().sum())
    for doc_id, text in list(zip(pdf["doc_id"], pdf["text"]))[:200]:
        if text is None:
            assert doc_id not in got
            continue
        toks = text.split(" ")
        feats = toks + (
            [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
            if len(toks) >= 2
            else []
        )
        total = int(w[_old_h32(feats) % CLF_BUCKETS].sum())
        q = abs(total) // len(feats)
        want = q if total >= 0 else -q
        assert got[doc_id]["clf_score"] == want, doc_id


def test_lm_kernel_matches_per_row_reference(spark, sf_dir):
    from bigdata_spark_realtime_spark.plans.ext_lm import (
        SCALE,
        ext_lm_score,
        train_lm,
    )

    big, uni, vocab = train_lm(spark, sf_dir)
    got = {r["doc_id"]: r for r in ext_lm_score(spark, sf_dir).collect()}
    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")
    for doc_id, text in list(zip(pdf["doc_id"], pdf["text"]))[:200]:
        toks = ("" if text is None else text).split(" ")
        if len(toks) < 2:
            assert doc_id not in got
            continue
        total = 0
        for w1, w2 in zip(toks[:-1], toks[1:]):
            total += (uni.get(w1, 0) + vocab) * SCALE // (big.get((w1, w2), 0) + 1)
        assert got[doc_id]["lm_score"] == total // (len(toks) - 1), doc_id
        assert got[doc_id]["n_bigrams"] == len(toks) - 1


def test_cooc_capped_pairs_match_self_join(spark, sf_dir):
    from pyspark.sql import functions as F

    from bigdata_spark_realtime_spark.plans.ext_funnel import (
        COOC_MAX_ITEMS_PER_USER,
        _cooc_capped_items,
        _cooc_capped_pairs,
    )
    from bigdata_spark_realtime_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    capped = _cooc_capped_items(ev, COOC_MAX_ITEMS_PER_USER)
    a = capped.select("user_id", F.col("item").alias("item_a"))
    b = capped.select(F.col("user_id").alias("uid_b"), F.col("item").alias("item_b"))
    join_pairs = sorted(
        (r["user_id"], r["item_a"], r["item_b"])
        for r in a.join(
            b,
            (F.col("user_id") == F.col("uid_b"))
            & (F.col("item_a") < F.col("item_b")),
        )
        .select("user_id", "item_a", "item_b")
        .collect()
    )
    array_pairs = sorted(
        (r["user_id"], r["item_a"], r["item_b"])
        for r in _cooc_capped_pairs(ev, COOC_MAX_ITEMS_PER_USER).collect()
    )
    assert array_pairs == join_pairs
