"""Property-based contracts for the ROUND-11 rotation targets — the
26 queries whose first independent driver row comes next round (the
simulated R11 window, plans/ROTATION_R11.md). Same discipline as the
round-10 waves: each registered DuckDB oracle runs over generated
tables and must match a pure-python reference, so the SQL algorithm is
verified over random inputs before its one driver shot.

Covers the events-side targets (time-to-convert, decile conversion,
cohort LTV, trending, bounce, drift upgraded to a full KS reference,
Gini, stratified priority draw) and the TPC-H-side targets (inventory
drawdown, balance percentile, fulfillment latency, revenue unpivot)
plus the embedding audits. The streaming twins in the window replay
these same oracles, so the pins carry to them through the
twin-equals-batch contract.
"""

from __future__ import annotations

import datetime
import math
from collections import Counter, defaultdict

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from property_util import DAY_US, HOUR_US, T0
from property_util import day_str as _day_str
from property_util import events_con as _events_con
from property_util import events_strategy
from property_util import h32 as _h32
from property_util import mk_rows as _mk_rows
from property_util import octave_bucket as _octave

ev_strategy = events_strategy(types=("view", "click", "purchase"))


# ---------------------------------------------------------------------------
# time-to-convert (plans/ext_convert.py)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(ev_strategy)
def test_time_to_convert_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_convert import (
        TIME_TO_CONVERT_ORACLE,
    )

    rows = _mk_rows(raw)
    con = _events_con(rows)
    got = {
        r.cohort_day: (r.n_converted, r.median_latency_ms, r.max_latency_ms)
        for r in con.sql(TIME_TO_CONVERT_ORACLE).df().itertuples()
    }
    tv: dict = {}
    tp: dict = {}
    for _, us, u, t, _v in rows:
        ms = us // 1000
        if t == "view":
            tv[u] = min(tv.get(u, ms), ms)
        elif t == "purchase":
            tp[u] = min(tp.get(u, ms), ms)
    cohorts: dict = defaultdict(list)
    for u in tv:
        if u in tp and tp[u] > tv[u]:
            cohorts[_day_str(tv[u] * 1000)].append((tp[u] - tv[u], u))
    expect = {}
    for day, lat in cohorts.items():
        lat.sort()
        n = len(lat)
        expect[day] = (n, lat[(n + 1) // 2 - 1][0], max(l for l, _ in lat))
    assert got == expect


# ---------------------------------------------------------------------------
# conversion by engagement decile (plans/ext_cohortval.py)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(ev_strategy)
def test_decile_conversion_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_cohortval import (
        DECILE_CONVERSION_ORACLE,
        N_DECILES,
        PPM,
    )

    rows = _mk_rows(raw)
    con = _events_con(rows)
    got = {
        r.decile: (
            r.n_users,
            r.n_converted,
            r.conv_ppm,
            r.min_events,
            r.max_events,
        )
        for r in con.sql(DECILE_CONVERSION_ORACLE).df().itertuples()
    }
    n_events: Counter = Counter()
    converted: dict = defaultdict(bool)
    for _, _, u, t, _v in rows:
        n_events[u] += 1
        converted[u] = converted[u] or t == "purchase"
    hist: Counter = Counter(_octave(n) for n in n_events.values())
    total = sum(hist.values())
    binmap, c = {}, 0
    for bkt in sorted(hist):
        c += hist[bkt]
        binmap[bkt] = min(N_DECILES - 1, N_DECILES * (c - 1) // total)
    per_decile: dict = defaultdict(list)
    for u, n in n_events.items():
        per_decile[binmap[_octave(n)]].append((n, converted[u]))
    expect = {}
    for d, users in per_decile.items():
        nu = len(users)
        nc = sum(1 for _, conv in users if conv)
        expect[d] = (
            nu,
            nc,
            PPM * nc // nu,
            min(n for n, _ in users),
            max(n for n, _ in users),
        )
    assert got == expect


# ---------------------------------------------------------------------------
# cohort LTV curve (plans/ext_cohortval.py)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(ev_strategy)
def test_cohort_value_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_cohortval import (
        COHORT_VALUE_ORACLE,
    )

    rows = _mk_rows(raw)
    con = _events_con(rows)
    got = {
        (r.cohort_day, r.day_offset): (r.n_purchases, r.cents, r.cum_cents)
        for r in con.sql(COHORT_VALUE_ORACLE).df().itertuples()
    }
    first_day: dict = {}
    for _, us, u, _t, _v in rows:
        d = us // DAY_US
        first_day[u] = min(first_day.get(u, d), d)
    grid: dict = defaultdict(lambda: [0, 0])
    for _, us, u, t, v in rows:
        if t == "purchase":
            off = us // DAY_US - first_day[u]
            key = (first_day[u], off)
            grid[key][0] += 1
            grid[key][1] += math.floor(v * 100)
    expect = {}
    cum: Counter = Counter()
    for (cd, off) in sorted(grid):
        n, cents = grid[(cd, off)]
        cum[cd] += cents
        expect[(_day_str(cd * DAY_US), off)] = (n, cents, cum[cd])
    assert got == expect


# ---------------------------------------------------------------------------
# trending items (plans/ext_windows2.py) — items ride props.k
# ---------------------------------------------------------------------------

trend_strategy = st.lists(
    st.tuples(
        st.integers(0, 8),           # hour
        st.integers(0, 3_599),
        st.integers(1, 4),           # item
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None)
@given(trend_strategy)
def test_trending_oracle_matches_python_reference(triples):
    import json

    from bigdata_spark_realtime_spark.plans.ext_windows2 import (
        TRENDING_ORACLE,
        TRENDING_TOP_K,
    )

    rows = [
        (i + 1, T0 + h * HOUR_US + s * 1_000_000, 1, "click", 1.0)
        for i, (h, s, _item) in enumerate(triples)
    ]
    props = [json.dumps({"k": item}) for _, _, item in triples]
    con = _events_con(rows, props)
    got = [
        (r.hr, r.item, r.c, r.rise)
        for r in con.sql(TRENDING_ORACLE + " ORDER BY hr, rise DESC, c DESC, item").df().itertuples()
    ]
    counts: Counter = Counter(
        (item, (T0 // HOUR_US) + h) for h, _s, item in triples
    )
    # rise vs the item's PREVIOUS OBSERVED hour (lag over observed rows)
    rise = {}
    by_item: dict = defaultdict(list)
    for (item, h), c in counts.items():
        by_item[item].append((h, c))
    for item, seq in by_item.items():
        seq.sort()
        prev = 0
        for h, c in seq:
            rise[(item, h)] = c - prev
            prev = c
    per_hour: dict = defaultdict(list)
    for (item, h), c in counts.items():
        per_hour[h].append((rise[(item, h)], c, item))
    expect = []
    for h in sorted(per_hour):
        top = sorted(per_hour[h], key=lambda r: (-r[0], -r[1], r[2]))
        hr = pd.Timestamp(h * 3600, unit="s").strftime("%Y-%m-%d %H")
        expect.extend(
            (hr, item, c, rs) for rs, c, item in top[:TRENDING_TOP_K]
        )
    assert got == expect


# ---------------------------------------------------------------------------
# bounce rate (plans/ext_windows2.py)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(ev_strategy)
def test_bounce_rate_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_windows2 import (
        _GAP_MS,
        BOUNCE_ORACLE,
        PPM,
    )

    rows = _mk_rows(raw)
    con = _events_con(rows)
    got = {
        r.day: (r.n_sessions, r.n_bounces, r.bounce_ppm)
        for r in con.sql(BOUNCE_ORACLE).df().itertuples()
    }
    by_user: dict = defaultdict(list)
    for eid, us, u, _t, _v in rows:
        by_user[u].append((us, eid))
    days: dict = defaultdict(lambda: [0, 0])
    for evs in by_user.values():
        evs.sort()
        sessions: list = []
        last = None
        for us, eid in evs:
            if last is None or us // 1000 - last // 1000 > _GAP_MS:
                sessions.append([])
            sessions[-1].append(us)
            last = us
        for s in sessions:
            day = _day_str(min(s))
            days[day][0] += 1
            days[day][1] += 1 if len(s) == 1 else 0
    expect = {
        d: (n, b, PPM * b // n) for d, (n, b) in days.items()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# distribution drift — full KS reference (upgrades the r9 range-only pin)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(ev_strategy)
def test_distribution_drift_oracle_matches_python_ks(raw):
    from bigdata_spark_realtime_spark.plans.ext_drift import (
        DRIFT_ORACLE,
        PPM,
    )

    rows = _mk_rows(raw)
    con = _events_con(rows)
    got = {
        r.event_type: (r.n1, r.n2, r.ks_num, r.drift_ppm)
        for r in con.sql(DRIFT_ORACLE).df().itertuples()
    }
    vals = [
        (t, us // DAY_US, math.floor(v * 100))
        for _, us, _, t, v in rows
        if v > 0
    ]
    if not vals:
        assert got == {}
        return
    mn = min(d for _, d, _ in vals)
    mx = max(d for _, d, _ in vals)
    hist: dict = defaultdict(lambda: [0, 0])
    for t, d, v100 in vals:
        half = 0 if 2 * d <= mn + mx else 1
        hist[(t, _octave(v100))][half] += 1
    expect = {}
    by_type: dict = defaultdict(dict)
    for (t, bkt), (c1, c2) in hist.items():
        by_type[t][bkt] = (c1, c2)
    for t, buckets in by_type.items():
        n1 = sum(c1 for c1, _ in buckets.values())
        n2 = sum(c2 for _, c2 in buckets.values())
        cum1 = cum2 = ks = 0
        for bkt in sorted(buckets):
            cum1 += buckets[bkt][0]
            cum2 += buckets[bkt][1]
            ks = max(ks, abs(cum1 * n2 - cum2 * n1))
        dppm = PPM if n1 == 0 or n2 == 0 else PPM * ks // (n1 * n2)
        expect[t] = (n1, n2, ks, dppm)
    assert got == expect


# ---------------------------------------------------------------------------
# event-mix Gini (plans/ext_drift.py) — full reference
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(ev_strategy)
def test_event_mix_gini_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_drift import GINI_ORACLE, PPM

    rows = _mk_rows(raw)
    con = _events_con(rows)
    got = {
        r.day: (r.n_events, r.n_types, r.gini_ppm)
        for r in con.sql(GINI_ORACLE).df().itertuples()
    }
    daily: Counter = Counter()
    for _, us, _, t, _v in rows:
        daily[(_day_str(us), t)] += 1
    by_day: dict = defaultdict(list)
    for (day, _t), c in daily.items():
        by_day[day].append(c)
    expect = {}
    for day, cs in by_day.items():
        n = sum(cs)
        sum_p2 = sum((1000 * c // n) ** 2 for c in cs)
        expect[day] = (n, len(cs), PPM - sum_p2)
    assert got == expect


# ---------------------------------------------------------------------------
# stratified priority draw (plans/ext_decay.py)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(ev_strategy)
def test_stratified_priority_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_decay import (
        STRATIFIED_K,
        STRATIFIED_PRIORITY_ORACLE,
    )

    rows = _mk_rows(raw)
    con = _events_con(rows)
    got = {
        r.event_id: (r.event_type, r.w_cents, r.priority)
        for r in con.sql(STRATIFIED_PRIORITY_ORACLE).df().itertuples()
    }
    per_type: dict = defaultdict(list)
    for eid, _, _, t, v in rows:
        w = math.floor(v * 100) + 1
        pr = (w << 32) // (_h32(str(eid)) + 1)
        per_type[t].append((pr, eid, w))
    expect = {}
    for t, cand in per_type.items():
        cand.sort(key=lambda r: (-r[0], r[1]))
        for pr, eid, w in cand[:STRATIFIED_K]:
            expect[eid] = (t, w, pr)
    assert got == expect


# ---------------------------------------------------------------------------
# TPC-H-side targets: drawdown, percentile, fulfillment, unpivot
# ---------------------------------------------------------------------------

li_strategy = st.lists(
    st.tuples(
        st.integers(1, 4),            # partkey
        st.integers(0, 120),          # ship day offset
        st.sampled_from(["R", "N", "A"]),
        st.integers(1, 50),           # quantity
        st.integers(100, 999_999),    # extendedprice cents
        st.integers(0, 10),           # discount %
        st.integers(0, 8),            # tax %
    ),
    min_size=1,
    max_size=40,
)

_EPOCH_DAY = datetime.date(2024, 1, 1)


def _lineitem_df(raw):
    n = len(raw)
    return pd.DataFrame(
        {
            "l_orderkey": pd.Series(
                [i // 7 + 1 for i in range(n)], dtype="int64"
            ),
            "l_linenumber": pd.Series(
                [i % 7 + 1 for i in range(n)], dtype="int64"
            ),
            "l_partkey": pd.Series([r[0] for r in raw], dtype="int64"),
            "l_shipdate": pd.Series(
                [
                    pd.Timestamp(_EPOCH_DAY + datetime.timedelta(days=r[1]))
                    for r in raw
                ]
            ).dt.date,
            "l_returnflag": pd.Series([r[2] for r in raw], dtype="object"),
            "l_quantity": pd.Series([float(r[3]) for r in raw], dtype="float64"),
            "l_extendedprice": pd.Series(
                [r[4] / 100.0 for r in raw], dtype="float64"
            ),
            "l_discount": pd.Series([r[5] / 100.0 for r in raw], dtype="float64"),
            "l_tax": pd.Series([r[6] / 100.0 for r in raw], dtype="float64"),
        }
    )


@settings(max_examples=15, deadline=None)
@given(li_strategy)
def test_inventory_drawdown_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_windows2 import (
        DRAWDOWN_ORACLE,
    )

    con = duckdb.connect()
    con.register("lineitem", _lineitem_df(raw))
    got = {
        r.partkey: (r.n_moves, r.peak_balance, r.max_drawdown)
        for r in con.sql(DRAWDOWN_ORACLE).df().itertuples()
    }
    per_part: dict = defaultdict(list)
    for i, (pk, day, rf, qty, *_rest) in enumerate(raw):
        per_part[pk].append(
            (day, i // 7 + 1, i % 7 + 1, qty if rf == "R" else -qty)
        )
    expect = {}
    for pk, moves in per_part.items():
        moves.sort()
        bal = 0
        peak = None
        max_dd = None
        for _, _, _, q in moves:
            bal += q
            peak = bal if peak is None else max(peak, bal)
            dd = peak - bal
            max_dd = dd if max_dd is None else max(max_dd, dd)
        expect[pk] = (len(moves), peak, max_dd)
    assert got == expect


supp_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),            # nationkey
        st.integers(-99_999, 99_999),  # acctbal cents
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None)
@given(supp_strategy)
def test_balance_percentile_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_windows2 import (
        PERCENTILE_ORACLE,
        PPM,
    )

    df = pd.DataFrame(
        {
            "s_suppkey": pd.Series(range(1, len(raw) + 1), dtype="int64"),
            "s_nationkey": pd.Series([r[0] for r in raw], dtype="int64"),
            "s_acctbal": pd.Series([r[1] / 100.0 for r in raw], dtype="float64"),
        }
    )
    con = duckdb.connect()
    con.register("supplier", df)
    got = {
        r.s_suppkey: (r.s_nationkey, r.bal_cents, r.pct_ppm)
        for r in con.sql(PERCENTILE_ORACLE).df().itertuples()
    }
    per_nation: dict = defaultdict(list)
    for i, (nk, cents) in enumerate(raw):
        per_nation[nk].append((math.floor(cents / 100.0 * 100), i + 1))
    expect = {}
    for nk, rowsn in per_nation.items():
        rowsn.sort()
        n = len(rowsn)
        for r, (bal, sk) in enumerate(rowsn, start=1):
            pct = 0 if n == 1 else PPM * (r - 1) // (n - 1)
            expect[sk] = (nk, bal, pct)
    assert got == expect


orders_strategy = st.lists(
    st.tuples(
        st.integers(0, 60),           # orderdate day offset
        st.sampled_from(["1-URGENT", "3-MEDIUM", "5-LOW"]),
        st.lists(st.integers(0, 120), min_size=1, max_size=4),  # ship offsets
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=15, deadline=None)
@given(orders_strategy)
def test_fulfillment_latency_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_rolling import (
        FULFILLMENT_ORACLE,
    )

    orders = pd.DataFrame(
        {
            "o_orderkey": pd.Series(range(1, len(raw) + 1), dtype="int64"),
            "o_orderpriority": pd.Series([r[1] for r in raw], dtype="object"),
            "o_orderdate": pd.Series(
                [
                    pd.Timestamp(_EPOCH_DAY + datetime.timedelta(days=r[0]))
                    for r in raw
                ]
            ).dt.date,
        }
    )
    li_rows = [
        (ok + 1, od + ship)
        for ok, (od, _p, ships) in enumerate(raw)
        for ship in ships
    ]
    li = pd.DataFrame(
        {
            "l_orderkey": pd.Series([r[0] for r in li_rows], dtype="int64"),
            "l_shipdate": pd.Series(
                [
                    pd.Timestamp(_EPOCH_DAY + datetime.timedelta(days=r[1]))
                    for r in li_rows
                ]
            ).dt.date,
        }
    )
    con = duckdb.connect()
    con.register("orders", orders)
    con.register("lineitem", li)
    got = {
        r.o_orderpriority: (
            r.n_orders,
            r.median_latency_days,
            r.max_latency_days,
        )
        for r in con.sql(FULFILLMENT_ORACLE).df().itertuples()
    }
    per_prio: dict = defaultdict(list)
    for ok, (od, prio, ships) in enumerate(raw):
        per_prio[prio].append((max(ships), ok + 1))
    expect = {}
    for prio, lat in per_prio.items():
        lat.sort()
        n = len(lat)
        expect[prio] = (n, lat[(n + 1) // 2 - 1][0], max(l for l, _ in lat))
    assert got == expect


@settings(max_examples=15, deadline=None)
@given(li_strategy)
def test_revenue_unpivot_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_rolling import UNPIVOT_ORACLE

    con = duckdb.connect()
    con.register("lineitem", _lineitem_df(raw))
    got = {
        (r.month, r.component): r.cents
        for r in con.sql(UNPIVOT_ORACLE).df().itertuples()
    }
    sums: dict = defaultdict(lambda: [0, 0, 0])
    for _pk, day, _rf, _q, price_cents, disc, tax in raw:
        d = _EPOCH_DAY + datetime.timedelta(days=day)
        month = f"{d.year:04d}-{d.month:02d}"
        price = price_cents / 100.0
        sums[month][0] += math.floor(price * 100)
        sums[month][1] += math.floor(price * (disc / 100.0) * 100)
        sums[month][2] += math.floor(price * (tax / 100.0) * 100)
    expect = {}
    for month, (g, dsc, tx) in sums.items():
        expect[(month, "gross")] = g
        expect[(month, "discount")] = dsc
        expect[(month, "tax")] = tx
    assert got == expect


# ---------------------------------------------------------------------------
# embedding audits (plans/ext_embaudit.py)
# ---------------------------------------------------------------------------

emb_strategy = st.lists(
    st.lists(
        st.integers(-2_000, 2_000).map(lambda x: x / 997.0),
        min_size=1,
        max_size=6,
    ),
    min_size=1,
    max_size=12,
)


def _emb_con(vecs):
    df = pd.DataFrame(
        {
            "vec_id": pd.Series(range(1, len(vecs) + 1), dtype="int64"),
            "embedding": pd.Series(list(vecs), dtype="object"),
        }
    )
    con = duckdb.connect()
    con.register("embeddings", df)
    return con


@settings(max_examples=15, deadline=None)
@given(emb_strategy)
def test_embedding_dim_stats_oracle_matches_python_reference(vecs):
    from bigdata_spark_realtime_spark.plans.ext_embed import FIXED_POINT
    from bigdata_spark_realtime_spark.plans.ext_embaudit import (
        DIM_STATS_ORACLE,
    )

    con = _emb_con(vecs)
    got = {
        r.dim: (r.n_vectors, r.sum_q, r.min_q, r.max_q, r.n_zero)
        for r in con.sql(DIM_STATS_ORACLE).df().itertuples()
    }
    per_dim: dict = defaultdict(list)
    for vec in vecs:
        for i, v in enumerate(vec):
            per_dim[i].append(math.floor(v * float(FIXED_POINT)))
    expect = {
        d: (len(q), sum(q), min(q), max(q), sum(1 for x in q if x == 0))
        for d, q in per_dim.items()
    }
    assert got == expect


@settings(max_examples=15, deadline=None)
@given(emb_strategy)
def test_embedding_norm_census_oracle_matches_python_reference(vecs):
    from bigdata_spark_realtime_spark.plans.ext_embed import FIXED_POINT
    from bigdata_spark_realtime_spark.plans.ext_embaudit import (
        NORM_CENSUS_ORACLE,
    )

    con = _emb_con(vecs)
    got = {
        r.octave: (r.n_vectors, r.norm_min, r.norm_max)
        for r in con.sql(NORM_CENSUS_ORACLE).df().itertuples()
    }
    per_oct: dict = defaultdict(list)
    for vec in vecs:
        norm_sq = sum(
            math.floor(v * float(FIXED_POINT)) ** 2 for v in vec
        )
        octv = 0 if norm_sq == 0 else norm_sq.bit_length()
        per_oct[octv].append(norm_sq)
    expect = {
        o: (len(ns), min(ns), max(ns)) for o, ns in per_oct.items()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# day-bounded session paths (plans/ext_paths.py, round-11 addition —
# seated directly in the R11 window at slot 48)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(ev_strategy)
def test_session_paths_daily_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_paths import (
        PATH_LEN,
        PATH_TOP_K,
        SESSION_PATHS_DAILY_ORACLE,
    )
    from bigdata_spark_realtime_spark.plans.sessionize import SESSION_GAP_MIN

    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    rows = _mk_rows(raw)
    con = _events_con(rows)
    got = [
        (r.path, r.n_sessions)
        for r in con.sql(SESSION_PATHS_DAILY_ORACLE).df().itertuples()
    ]

    # pure-python reference: per (user, utc-day) ordered by (ts,
    # event_id), split on gap > 30 min, first-PATH_LEN prefix joined
    per_day: dict = defaultdict(list)
    for eid, us, u, t, _v in rows:
        per_day[(u, us // DAY_US)].append((us, eid, t))
    paths: Counter = Counter()
    for evs in per_day.values():
        evs.sort()
        sessions: list[list[str]] = []
        prev = None
        for us, _eid, t in evs:
            if prev is None or us - prev > gap_us:
                sessions.append([])
            sessions[-1].append(t)
            prev = us
        for s in sessions:
            paths[">".join(s[:PATH_LEN])] += 1
    expect = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:PATH_TOP_K]
    assert got == expect
