"""Property-based contracts for the ROUND-12 rotation's document-family
targets — `ext_split_leakage`, `ext_contrastive_triplets` and
`ext_dedup_impact` get their first driver row in R12 (the simulated
window in plans/ROTATION_R12.md). Same discipline as the round-10/11
waves: each registered DuckDB oracle runs over generated `documents`
tables and must match a pure-python reference (SimHash bit sums, band
pigeonhole + hamming verify, md5 split buckets, modular-id negative
picks, the full K=64 MinHash→LSH→connected-components chain), so the
SQL algorithm is verified over random corpora before its one driver
shot. The four streaming-twin stragglers are covered through their
batch oracles (retention/snapshot/attribution/skew pins in
test_round10_property*.py / test_round12_property.py).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from property_util import h32 as _h32

_U64 = (1 << 64) - 1


def _docs_con(docs):
    """docs: list[(doc_id, text)] -> DuckDB con with a documents view."""
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": pd.Series([d for d, _ in docs], dtype="int64"),
                "text": pd.Series([t for _, t in docs], dtype="object"),
            }
        ),
    )
    return con


def _h32b(s: str) -> int:
    """Python twin of functions/hashing.h32b: md5 hex digits 9-16."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[8:16], 16)


def _simhash(text: str) -> int:
    """Signed-int64 SimHash twin of plans/ext_dedup.SIMHASH_ORACLE:
    per-token ±1 sums per bit (lo 32 bits from h32, hi 32 from h32b),
    bit set when the sum is strictly positive."""
    toks = text.split(" ")
    sums = [0] * 64
    for t in toks:
        lo, hi = _h32(t), _h32b(t)
        for i in range(32):
            sums[i] += 1 if (lo >> i) & 1 else -1
            sums[32 + i] += 1 if (hi >> i) & 1 else -1
    u = sum(1 << i for i in range(64) if sums[i] > 0)
    return u - (1 << 64) if u >= (1 << 63) else u


def _simhash_pairs(docs):
    """(doc_a, doc_b, hamming) twin of SIMHASH_PAIRS_ORACLE: 4×16-bit
    band blocking, exact hamming <= 3 verify."""
    sh = {d: _simhash(t) for d, t in docs}
    buckets: dict = defaultdict(list)
    for d, s in sh.items():
        for b in range(4):
            buckets[(b, (s >> (16 * b)) & 0xFFFF)].append(d)
    cand = set()
    for ids in buckets.values():
        ids.sort()
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                cand.add((a, b))
    out = []
    for a, b in cand:
        ham = bin((sh[a] ^ sh[b]) & _U64).count("1")
        if ham <= 3:
            out.append((a, b, ham))
    return out


#: corpora: sequential-with-gap sparse ids; tiny vocab + short docs so
#: band collisions happen organically; the clone flag plants exact
#: duplicates (hamming 0) so the pair/cluster paths are never vacuous
doc_strategy = st.lists(
    st.tuples(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta"]),
            min_size=1,
            max_size=8,
        ),
        st.booleans(),
    ),
    min_size=1,
    max_size=10,
)


def _mk_docs(raw):
    docs = []
    for toks, clone in raw:
        docs.append(" ".join(toks))
        if clone:
            docs.append(" ".join(toks))
    # sparse, unordered-friendly id space (gaps exercise the triplet
    # dropped-negative path: neg_key mod (max+1) may hit a hole)
    return [(3 * i + (i % 2), t) for i, t in enumerate(docs)]


@settings(max_examples=15, deadline=None)
@given(doc_strategy)
def test_simhash_pairs_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_dedup import (
        SIMHASH_PAIRS_ORACLE,
    )

    docs = _mk_docs(raw)
    con = _docs_con(docs)
    got = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in con.sql(SIMHASH_PAIRS_ORACLE).df().itertuples()
    )
    assert got == sorted(_simhash_pairs(docs))


@settings(max_examples=15, deadline=None)
@given(doc_strategy)
def test_split_leakage_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_split import (
        SPLIT_LEAKAGE_ORACLE,
        TRAIN_LT,
        VALID_LT,
    )

    docs = _mk_docs(raw)
    con = _docs_con(docs)
    got = {
        (r.split_a, r.split_b): r.n_pairs
        for r in con.sql(SPLIT_LEAKAGE_ORACLE).df().itertuples()
    }

    def split(doc_id: int) -> str:
        b = _h32(str(doc_id)) % 100
        return "train" if b < TRAIN_LT else ("valid" if b < VALID_LT else "test")

    expect: Counter = Counter()
    for a, b, _h in _simhash_pairs(docs):
        sa, sb = split(a), split(b)
        expect[(min(sa, sb), max(sa, sb))] += 1
    assert got == dict(expect)


@settings(max_examples=15, deadline=None)
@given(doc_strategy)
def test_contrastive_triplets_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_triplets import (
        TRIPLETS_ORACLE,
    )

    docs = _mk_docs(raw)
    con = _docs_con(docs)
    got = sorted(
        (r.anchor_id, r.positive_id, r.negative_id)
        for r in con.sql(TRIPLETS_ORACLE).df().itertuples()
    )
    ids = {d for d, _ in docs}
    n = max(ids) + 1
    expect = []
    for a, b, _h in _simhash_pairs(docs):
        neg = _h32(f"{a}:{b}") % n
        if neg in ids and neg != a and neg != b:
            expect.append((a, b, neg))
    assert got == sorted(expect)


@settings(max_examples=15, deadline=None)
@given(doc_strategy)
def test_dedup_impact_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.functions.hashing import (
        K,
        MINHASH_A,
        MINHASH_B,
        P,
        SHINGLE_W,
    )
    from bigdata_spark_realtime_spark.plans.ext_dedup_impact import (
        DEDUP_IMPACT_ORACLE,
    )

    docs = _mk_docs(raw)
    con = _docs_con(docs)
    got = {
        r.cluster_size: (r.n_clusters, r.n_docs, r.n_removed)
        for r in con.sql(DEDUP_IMPACT_ORACLE).df().itertuples()
    }

    # python MinHash→LSH candidates (plans/ext_dedup._SIG_CTE twin)
    sigs = {}
    for d, text in docs:
        toks = text.split(" ")
        if len(toks) < SHINGLE_W:
            continue
        sh = {
            " ".join(toks[i : i + SHINGLE_W])
            for i in range(len(toks) - SHINGLE_W + 1)
        }
        hs = [_h32(s) % P for s in sh]
        sigs[d] = [min((MINHASH_A[j] * h + MINHASH_B[j]) % P for h in hs)
                   for j in range(K)]
    buckets: dict = defaultdict(list)
    for d, m in sigs.items():
        for b in range(K // 4):
            buckets[(b, m[4 * b] * P + m[4 * b + 1],
                     m[4 * b + 2] * P + m[4 * b + 3])].append(d)
    # union-find over candidate pairs; keeper = min id per component
    parent = {d: d for d, _ in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for ids in buckets.values():
        for other in ids[1:]:
            ra, rb = find(ids[0]), find(other)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    comp: dict = defaultdict(int)
    for d, _ in docs:
        comp[find(d)] += 1
    hist: Counter = Counter(comp.values())
    expect = {
        size: (cnt, size * cnt, (size - 1) * cnt)
        for size, cnt in hist.items()
    }
    assert got == expect
