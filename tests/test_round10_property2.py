"""Property-based contracts, wave 2: the graph / snapshot / audit
rotation targets. Same discipline as test_round10_property.py — the
registered DuckDB oracle SQL runs over a generated table and must
match an independent pure-python reference, so the SQL encoding (the
degree-ordered triangle orientation, the integer Jacobi iteration, the
min-label rounds, the snapshot QUALIFY) is verified over random
inputs, not one fixture.

The graph trio (triangle count, PageRank, communities) is the riskiest
math in the R10/R11 windows: iterative, orientation-dependent, and
its planted tests cover one topology each. Brute-force references here
enumerate triangles directly and run the textbook label/rank updates,
so an orientation double-count or a dropped dangling node shows up on
the first random graph that has one.
"""

from __future__ import annotations

import itertools
import json
import math
from collections import Counter, defaultdict

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from property_util import HOUR_US, T0
from property_util import events_con as _events_con
from property_util import events_strategy
from property_util import h32 as _h32
from property_util import mk_rows as _mk_rows

ev_strategy = events_strategy()


# ---------------------------------------------------------------------------
# co-visitation graph inputs: (user, item) pairs carried in props.k
# ---------------------------------------------------------------------------

graph_strategy = st.lists(
    st.tuples(st.integers(1, 5), st.integers(1, 8)),
    min_size=1,
    max_size=30,
)


def _graph_con(pairs):
    rows = [
        (i + 1, T0 + i * 1_000_000, u, "click", 1.0)
        for i, (u, _item) in enumerate(pairs)
    ]
    props = [json.dumps({"k": item}) for _, item in pairs]
    return _events_con(rows, props)


def _covis_edges(pairs):
    """distinct undirected co-visitation edges {a, b} with a < b (the
    256-per-user cap never binds at this size)"""
    items_by_user: dict = defaultdict(set)
    for u, item in pairs:
        items_by_user[u].add(item)
    edges = set()
    for items in items_by_user.values():
        for a, b in itertools.combinations(sorted(items), 2):
            edges.add((a, b))
    return edges


@settings(max_examples=15, deadline=None)
@given(graph_strategy)
def test_triangle_oracle_matches_bruteforce_enumeration(pairs):
    from bigdata_spark_realtime_spark.plans.ext_graphtri import (
        TRIANGLE_ORACLE,
    )

    con = _graph_con(pairs)
    got = {
        r.item: (r.degree, r.n_tri)
        for r in con.sql(TRIANGLE_ORACLE).df().itertuples()
    }
    edges = _covis_edges(pairs)
    deg: Counter = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    n_tri: Counter = Counter()
    for x, y, z in itertools.combinations(sorted(deg), 3):
        if (x, y) in edges and (x, z) in edges and (y, z) in edges:
            n_tri[x] += 1
            n_tri[y] += 1
            n_tri[z] += 1
    expect = {i: (d, n_tri[i]) for i, d in deg.items()}
    assert got == expect


@settings(max_examples=15, deadline=None)
@given(graph_strategy)
def test_pagerank_oracle_matches_python_jacobi(pairs):
    from bigdata_spark_realtime_spark.plans.ext_graphrank import (
        N_ITERS,
        PAGERANK_ORACLE,
        RANK_SCALE,
        _BASE,
    )

    con = _graph_con(pairs)
    got = {
        r.item: r.rank_q for r in con.sql(PAGERANK_ORACLE).df().itertuples()
    }
    und = [
        e for a, b in _covis_edges(pairs) for e in ((a, b), (b, a))
    ]
    deg: Counter = Counter(src for src, _ in und)
    r = {i: RANK_SCALE for i in deg}
    for _ in range(N_ITERS):
        incoming: Counter = Counter()
        for src, dst in und:
            incoming[dst] += r[src] // deg[src]
        r = {i: _BASE + 85 * s // 100 for i, s in incoming.items()}
    assert got == r


@settings(max_examples=15, deadline=None)
@given(graph_strategy)
def test_communities_oracle_matches_python_min_label(pairs):
    from bigdata_spark_realtime_spark.plans.ext_communities import (
        COMMUNITIES_ORACLE,
        N_ROUNDS,
    )

    con = _graph_con(pairs)
    got = {
        r.item: r.community
        for r in con.sql(COMMUNITIES_ORACLE).df().itertuples()
    }
    nodes = {item for _, item in pairs}
    nbrs: dict = {i: {i} for i in nodes}  # self-loop per node
    for a, b in _covis_edges(pairs):
        nbrs[a].add(b)
        nbrs[b].add(a)
    lbl = {i: i for i in nodes}
    for _ in range(N_ROUNDS):
        lbl = {i: min(lbl[j] for j in nbrs[i]) for i in nodes}
    assert got == lbl


# ---------------------------------------------------------------------------
# event transitions (global + day-bounded)
# ---------------------------------------------------------------------------


def _transitions_reference(rows, daily: bool):
    by_key: dict = defaultdict(list)
    for eid, us, u, t, _v in rows:
        day = us // (24 * HOUR_US) if daily else 0
        by_key[(u, day)].append((us, eid, t))
    trans: Counter = Counter()
    for evs in by_key.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            trans[(a, b)] += 1
    return trans


@settings(max_examples=15, deadline=None)
@given(ev_strategy)
def test_transitions_oracles_match_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_funnel import (
        TRANSITIONS_DAILY_ORACLE,
        TRANSITIONS_ORACLE,
    )

    rows = _mk_rows(raw)
    con = _events_con(rows)
    for sql, daily in (
        (TRANSITIONS_ORACLE, False),
        (TRANSITIONS_DAILY_ORACLE, True),
    ):
        got = {
            (r.from_type, r.to_type): r.n_transitions
            for r in con.sql(sql).df().itertuples()
        }
        assert got == dict(_transitions_reference(rows, daily))


# ---------------------------------------------------------------------------
# key-skew audit
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(ev_strategy)
def test_skew_audit_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_skewcheck import (
        SKEW_AUDIT_ORACLE,
        SKEW_TOP_K,
    )

    rows = _mk_rows(raw)
    con = _events_con(rows)
    got = [
        (r.user_id, r.cnt, r.share_ppm)
        for r in con.sql(SKEW_AUDIT_ORACLE).df().itertuples()
    ]
    cnt: Counter = Counter(u for _, _, u, _, _ in rows)
    total = sum(cnt.values())
    expect = sorted(
        ((u, c, 1_000_000 * c // total) for u, c in cnt.items()),
        key=lambda r: (-r[1], r[0]),
    )
    assert got == expect[:SKEW_TOP_K]


# ---------------------------------------------------------------------------
# rollup anomaly flags (rank-median deviation)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(ev_strategy)
def test_rollup_anomaly_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_anomaly import (
        ANOM_HI_PPM,
        ANOM_LO_PPM,
        ANOMALY_ORACLE,
    )

    rows = _mk_rows(raw)
    con = _events_con(rows)
    got = {
        (r.day, r.event_type): (r.ct, r.median_ct, r.dev_ppm, r.is_anomaly)
        for r in con.sql(ANOMALY_ORACLE).df().itertuples()
    }
    daily: Counter = Counter()
    for _, us, _, t, _v in rows:
        day = pd.Timestamp((us // 1_000_000), unit="s").strftime("%Y-%m-%d")
        daily[(day, t)] += 1
    med = {}
    by_type: dict = defaultdict(list)
    for (day, t), ct in daily.items():
        by_type[t].append((ct, day))
    for t, cts in by_type.items():
        cts.sort()
        med[t] = cts[(len(cts) + 1) // 2 - 1][0]
    expect = {}
    for (day, t), ct in daily.items():
        dev = 1_000_000 * ct // med[t]
        flag = 1 if dev >= ANOM_HI_PPM or dev <= ANOM_LO_PPM else 0
        expect[(day, t)] = (ct, med[t], dev, flag)
    assert got == expect


# ---------------------------------------------------------------------------
# snapshot diff (CDC at rest)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(ev_strategy)
def test_snapshot_diff_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_snapshot import (
        SNAPSHOT_DIFF_ORACLE,
    )

    rows = _mk_rows(raw)
    con = _events_con(rows)
    got = {
        r.user_id: (
            r.change_type,
            r.old_type,
            r.new_type,
            r.old_value,
            r.new_value,
        )
        for r in con.sql(SNAPSHOT_DIFF_ORACLE).df().itertuples()
    }
    lo = min(us for _, us, _, _, _ in rows)
    hi = max(us for _, us, _, _, _ in rows)
    t1 = lo + (hi - lo) * 6 // 10

    def snap(cut):
        state = {}
        for eid, us, u, t, v in rows:
            if us <= cut and (
                u not in state or (us, eid) > state[u][0]
            ):
                state[u] = ((us, eid), t, v)
        return {u: (t, v) for u, (_, t, v) in state.items()}

    s1, s2 = snap(t1), snap(hi)
    expect = {}
    for u, (t2_type, t2_val) in s2.items():
        if u not in s1:
            expect[u] = ("insert", None, t2_type, None, t2_val)
        elif s1[u] != (t2_type, t2_val):
            expect[u] = ("update", s1[u][0], t2_type, s1[u][1], t2_val)
    # NaN-free inputs, so direct compare is safe; normalize pandas NaN
    got = {
        u: tuple(None if isinstance(x, float) and math.isnan(x) else x
                 for x in v)
        for u, v in got.items()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# exact set-similarity join + md5 top-K hash sample over documents
# ---------------------------------------------------------------------------

docs_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=10),
    min_size=1,
    max_size=8,
)


def _docs_con(doc_toks):
    df = pd.DataFrame(
        {
            "doc_id": pd.Series(range(1, len(doc_toks) + 1), dtype="int64"),
            "text": [" ".join(t) for t in doc_toks],
            "source": ["src%d" % (i % 3) for i in range(len(doc_toks))],
        }
    )
    con = duckdb.connect()
    con.register("documents", df)
    return con


@settings(max_examples=15, deadline=None)
@given(docs_strategy)
def test_setsim_join_oracle_matches_python_reference(doc_toks):
    from bigdata_spark_realtime_spark.functions.hashing import SHINGLE_W
    from bigdata_spark_realtime_spark.plans.ext_setjoin import (
        SETSIM_ORACLE,
        TAU_DEN,
        TAU_NUM,
    )

    con = _docs_con(doc_toks)
    got = {
        (r.doc_a, r.doc_b): (r.inter_sz, r.union_sz, r.jaccard)
        for r in con.sql(SETSIM_ORACLE).df().itertuples()
    }
    sh = {
        i + 1: {
            " ".join(t[j : j + SHINGLE_W])
            for j in range(len(t) - SHINGLE_W + 1)
        }
        for i, t in enumerate(doc_toks)
        if len(t) >= SHINGLE_W
    }
    expect = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        if inter > 0 and TAU_DEN * inter >= TAU_NUM * union:
            expect[(a, b)] = (inter, union, inter / union)
    assert got == expect


@settings(max_examples=15, deadline=None)
@given(docs_strategy)
def test_topk_hash_sample_oracle_matches_python_reference(doc_toks):
    from bigdata_spark_realtime_spark.plans.ext_sampling import (
        SAMPLE_K,
        TOPK_HASH_ORACLE,
    )

    con = _docs_con(doc_toks)
    got = [
        (r.doc_id, r.source)
        for r in con.sql(TOPK_HASH_ORACLE).df().itertuples()
    ]
    expect = sorted(
        (
            (i + 1, "src%d" % (i % 3))
            for i in range(len(doc_toks))
        ),
        key=lambda r: (_h32(f"topk|{r[0]}"), r[0]),
    )
    assert got == expect[:SAMPLE_K]
