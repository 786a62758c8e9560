"""Property-based contracts (hypothesis) for the round-10 rotation
targets' oracle math — the queries whose FIRST independent driver row
is this round's gate run. Same discipline as
tests/test_round9_property.py: each property evaluates the registered
DuckDB oracle SQL over a generated in-memory table and checks it
against an independent pure-python reference, so the SQL encoding of
the algorithm — not just one fixture's answer — is what's verified.
DuckDB-only per example keeps the suite fast (no Spark per case); the
cross-engine mirrors + the partition-invariance mirror then carry the
pinned oracle semantics to the Spark side.

Covered here (each a R10_TARGET with only a planted single-fixture
test before): bigram PMI lift, equi-depth binning, funnel conversion,
multi-touch attribution, F2 self-join-size sketch, A/B hash split,
seasonal baseline deviation, session path census, weighted priority
sampling.
"""

from __future__ import annotations

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
from property_util import octave_bucket as _octave_bucket

ev_strategy = events_strategy()

#: funnel-shaped strategy: types include the staged funnel's three;
#: hours span the 7 d conversion window
funnel_strategy = events_strategy(
    max_hour=240, max_user=4, types=("signup", "click", "purchase", "view")
)


# ---------------------------------------------------------------------------
# bigram PMI (plans/ext_colloc.py)
# ---------------------------------------------------------------------------

docs_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=2, max_size=12),
    min_size=1,
    max_size=8,
)


@settings(max_examples=15, deadline=None)
@given(docs_strategy)
def test_bigram_pmi_oracle_matches_python_reference(doc_toks):
    from bigdata_spark_realtime_spark.plans.ext_colloc import (
        BIGRAM_PMI_ORACLE,
        PMI_MIN_COUNT,
        PMI_SCALE,
        PMI_TOP_K,
    )

    # the round-15 linear zip-unnest oracle keys adjacency by doc_id
    # (lead() OVER PARTITION BY doc_id), so the fixture needs one
    df = pd.DataFrame(
        {
            "doc_id": range(len(doc_toks)),
            "text": [" ".join(t) for t in doc_toks],
        }
    )
    con = duckdb.connect()
    con.register("documents", df)
    got = [
        (r.w1, r.w2, r.cab, r.lift_q)
        for r in con.sql(BIGRAM_PMI_ORACLE).df().itertuples()
    ]
    uni: Counter = Counter()
    big: Counter = Counter()
    for toks in doc_toks:
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    n = sum(uni.values())
    scored = [
        (w1, w2, cab, PMI_SCALE * cab * n // (uni[w1] * uni[w2]))
        for (w1, w2), cab in big.items()
        if cab >= PMI_MIN_COUNT
    ]
    scored.sort(key=lambda r: (-r[3], -r[2], r[0], r[1]))
    assert got == scored[:PMI_TOP_K]


# ---------------------------------------------------------------------------
# equi-depth binning (plans/ext_binning.py)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(ev_strategy)
def test_equidepth_binning_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_binning import (
        BINNING_ORACLE,
        N_BINS,
    )

    rows = _mk_rows(raw)
    con = _events_con(rows)
    got = {
        r.event_id: (r.event_type, r.v100, r.bin)
        for r in con.sql(BINNING_ORACLE).df().itertuples()
    }
    # python reference: octave histogram -> cumulative -> integer bin
    keyed = [
        (eid, t, math.floor(v * 100))
        for eid, _, _, t, v in rows
        if v > 0
    ]
    hist: dict = defaultdict(Counter)
    for _, t, v100 in keyed:
        hist[t][_octave_bucket(v100)] += 1
    binmap: dict = {}
    for t, cnts in hist.items():
        n = sum(cnts.values())
        c = 0
        for bkt in sorted(cnts):
            c += cnts[bkt]
            binmap[(t, bkt)] = min(N_BINS - 1, N_BINS * (c - 1) // n)
    expect = {
        eid: (t, v100, binmap[(t, _octave_bucket(v100))])
        for eid, t, v100 in keyed
    }
    assert got == expect


# ---------------------------------------------------------------------------
# funnel conversion (plans/ext_funnel.py)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(funnel_strategy)
def test_funnel_conversion_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_funnel import (
        CONVERSION_ORACLE,
        FUNNEL_WINDOW_US,
    )

    rows = _mk_rows(raw)
    con = _events_con(rows)
    got = [
        (r.step, r.step_name, r.n_users, r.conv_from_prev_ppm)
        for r in con.sql(
            CONVERSION_ORACLE + " ORDER BY step"
        ).df().itertuples()
    ]
    by_user: dict = defaultdict(list)
    for _, us, u, t, _v in rows:
        by_user[u].append((us, t))
    s1, s2, done = {}, {}, set()
    for u, evs in by_user.items():
        t1 = min((us for us, t in evs if t == "signup"), default=None)
        if t1 is None:
            continue
        s1[u] = t1
        t2 = min(
            (us for us, t in evs if t == "click" and us > t1), default=None
        )
        if t2 is None:
            continue
        s2[u] = t2
        t3 = min(
            (us for us, t in evs if t == "purchase" and us > t2),
            default=None,
        )
        if t3 is not None and t3 - t1 <= FUNNEL_WINDOW_US:
            done.add(u)
    n1, n2, n3 = len(s1), len(s2), len(done)

    def conv(cur, prev):
        return 1_000_000 if prev == 0 else 1_000_000 * cur // prev

    assert got == [
        (1, "signup", n1, 1_000_000),
        (2, "click_after_signup", n2, conv(n2, n1)),
        (3, "purchase_in_window", n3, conv(n3, n2)),
    ]


# ---------------------------------------------------------------------------
# multi-touch attribution (plans/ext_attrib.py)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(funnel_strategy)
def test_multitouch_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_attrib import (
        CREDIT_SCALE,
        MAX_TOUCH_PER_PURCHASE,
        MULTITOUCH_ORACLE,
    )
    from bigdata_spark_realtime_spark.plans.ext_rangejoin import WINDOW_US

    rows = _mk_rows(raw)
    con = _events_con(rows)
    got = {
        r.click_id: (r.credit_ppm, r.n_conversions)
        for r in con.sql(MULTITOUCH_ORACLE).df().itertuples()
    }
    clicks = [(eid, u, us) for eid, us, u, t, _ in rows if t == "click"]
    purchases = [(eid, u, us) for eid, us, u, t, _ in rows if t == "purchase"]
    credit: Counter = Counter()
    nconv: Counter = Counter()
    for pid, pu, pus in purchases:
        touches = [
            (cus, cid)
            for cid, cu, cus in clicks
            if cu == pu and pus > cus and pus <= cus + WINDOW_US
        ]
        # recency cap: most recent clicks win, id desc breaks ties
        touches.sort(key=lambda t: (-t[0], -t[1]))
        touches = touches[:MAX_TOUCH_PER_PURCHASE]
        if not touches:
            continue
        share = CREDIT_SCALE // len(touches)
        for _, cid in touches:
            credit[cid] += share
            nconv[cid] += 1
    expect = {cid: (credit[cid], nconv[cid]) for cid, _, _ in clicks}
    assert got == expect


# ---------------------------------------------------------------------------
# F2 self-join-size sketch (plans/ext_sketch2.py)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(ev_strategy)
def test_f2_sketch_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_sketch2 import (
        F2_D,
        F2_W,
        SELFJOIN_SIZE_ORACLE,
    )

    rows = _mk_rows(raw)
    con = _events_con(rows)
    got = {
        r.event_type: (r.est_f2, r.exact_f2)
        for r in con.sql(SELFJOIN_SIZE_ORACLE).df().itertuples()
    }
    freq: dict = defaultdict(Counter)
    for _, _, u, t, _v in rows:
        freq[t][u] += 1
    expect = {}
    for t, fu in freq.items():
        exact = sum(f * f for f in fu.values())
        ests = []
        for d in range(F2_D):
            buckets: Counter = Counter()
            for u, f in fu.items():
                buckets[_h32(f"f2cms{d}|{u}") % F2_W] += f
            ests.append(sum(c * c for c in buckets.values()))
        expect[t] = (min(ests), exact)
        assert min(ests) >= exact  # one-sided guarantee
    assert got == expect


# ---------------------------------------------------------------------------
# A/B hash split (plans/ext_paths.py)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(funnel_strategy)
def test_ab_assignment_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_paths import AB_ORACLE, PPM

    rows = _mk_rows(raw)
    con = _events_con(rows)
    got = {
        r.arm: (r.n_users, r.n_converted, r.conv_ppm)
        for r in con.sql(AB_ORACLE).df().itertuples()
    }
    conv: dict = {}
    for _, _, u, t, _v in rows:
        conv[u] = conv.get(u, False) or t == "purchase"
    arms: dict = defaultdict(lambda: [0, 0])
    for u, c in conv.items():
        a = _h32(f"{u}|ab") % 2
        arms[a][0] += 1
        arms[a][1] += int(c)
    expect = {
        a: (n, k, PPM * k // n) for a, (n, k) in arms.items()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# seasonal baseline (plans/ext_timeseries2.py)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(ev_strategy)
def test_seasonal_baseline_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_timeseries2 import (
        PPM,
        SEASONAL_ORACLE,
    )

    rows = _mk_rows(raw)
    con = _events_con(rows)
    got = {
        (r.event_type, r.hr): (r.hod, r.avg_h, r.avg_hod, r.dev_ppm)
        for r in con.sql(SEASONAL_ORACLE).df().itertuples()
    }
    hourly: dict = defaultdict(lambda: [0, 0])  # (type, h) -> [cnt, v100]
    for _, us, _, t, v in rows:
        h = us // HOUR_US
        hourly[(t, h)][0] += 1
        hourly[(t, h)][1] += math.floor(v * 100)
    base: dict = defaultdict(lambda: [0, 0])  # (type, hod) -> [sum v, sum c]
    for (t, h), (cnt, v100) in hourly.items():
        hod = h % 24  # T0 is midnight UTC, so hour-of-day is h mod 24
        base[(t, hod)][0] += v100
        base[(t, hod)][1] += cnt
    expect = {}
    for (t, h), (cnt, v100) in hourly.items():
        hod = h % 24
        avg_h = v100 // cnt
        avg_hod = base[(t, hod)][0] // base[(t, hod)][1]
        dev = 0 if avg_hod == 0 else PPM * avg_h // avg_hod - PPM
        key = pd.Timestamp((h * HOUR_US) // 1_000_000, unit="s").strftime(
            "%Y-%m-%d %H"
        )
        expect[(t, key)] = (hod, avg_h, avg_hod, dev)
    assert got == expect


# ---------------------------------------------------------------------------
# session path census (plans/ext_paths.py)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(funnel_strategy)
def test_session_paths_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_paths import (
        PATH_LEN,
        PATH_TOP_K,
        SESSION_PATHS_ORACLE,
        _GAP_MS,
    )

    rows = _mk_rows(raw)
    con = _events_con(rows)
    got = [
        (r.path, r.n_sessions)
        for r in con.sql(SESSION_PATHS_ORACLE).df().itertuples()
    ]
    by_user: dict = defaultdict(list)
    for eid, us, u, t, _v in rows:
        by_user[u].append((us, eid, t))
    paths: Counter = Counter()
    for u, evs in by_user.items():
        evs.sort()
        sessions: list = []
        last_us = None
        for us, eid, t in evs:
            if last_us is None or us // 1000 - last_us // 1000 > _GAP_MS:
                sessions.append([])
            sessions[-1].append(t)
            last_us = us
        for s in sessions:
            paths[">".join(s[:PATH_LEN])] += 1
    expect = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == expect[:PATH_TOP_K]


# ---------------------------------------------------------------------------
# weighted priority sample (plans/ext_sampling2.py)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(ev_strategy)
def test_priority_sample_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_sampling2 import (
        PRIORITY_K,
        PRIORITY_SAMPLE_ORACLE,
    )

    rows = _mk_rows(raw)
    con = _events_con(rows)
    got = [
        (r.event_id, r.event_type, r.w_cents, r.priority)
        for r in con.sql(PRIORITY_SAMPLE_ORACLE).df().itertuples()
    ]
    expect = []
    for eid, _, _, t, v in rows:
        w = math.floor(v * 100) + 1
        u = _h32(str(eid)) + 1
        expect.append((eid, t, w, (w << 32) // u))
    expect.sort(key=lambda r: (-r[3], r[0]))
    assert got == expect[:PRIORITY_K]
