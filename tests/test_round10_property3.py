"""Property-based contracts, wave 3: the sketch-register rotation
targets (hourly HLL rollup, approx aggregates) and the event-feed
contract audit. The HLL references rebuild the md5 register math in
pure python — bucket = h32 % M, rank = 25 − bitlen(h32 // M), scaled
harmonic sum Σ 2^(S−reg) — so a drift in the SQL encoding of the
registers (not just an estimate out of tolerance) fails on the first
random input that exercises it.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from property_util import HOUR_US, T0
from property_util import events_con as _events_con
from property_util import events_strategy
from property_util import h32 as _h32
from property_util import mk_rows as _mk_rows
from property_util import octave_bucket as _octave_bucket


def _hll_parts(user_ids, m: int, s: int):
    """register build + scaled harmonic state for one group"""
    regs: dict = {}
    for u in set(user_ids):
        h = _h32(str(u))
        bucket, w = h % m, h // m
        rank = 25 if w == 0 else 25 - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rank)
    sum_scaled = sum(1 << (s - r) for r in regs.values()) + (
        m - len(regs)
    ) * (1 << s)
    return regs, sum_scaled, len(regs)


#: wider user space for the sketches
ev_strategy = events_strategy(max_user=50)


# ---------------------------------------------------------------------------
# hourly HLL rollup (plans/ext_sketch_window.py)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(ev_strategy)
def test_hll_hourly_rollup_oracle_matches_python_registers(raw):
    from bigdata_spark_realtime_spark.plans.ext_sketch import M, S
    from bigdata_spark_realtime_spark.plans.ext_sketch_window import (
        HLL_HOURLY_ORACLE,
    )

    rows = _mk_rows(raw)
    con = _events_con(rows)
    got = {
        (r.grain, r.period, r.event_type): (r.sum_scaled, r.nonzero)
        for r in con.sql(HLL_HOURLY_ORACLE).df().itertuples()
    }
    by_hour: dict = defaultdict(list)
    by_day: dict = defaultdict(list)
    for _, us, u, t, _v in rows:
        stamp = pd.Timestamp(us // 1_000_000, unit="s")
        by_hour[(stamp.strftime("%Y-%m-%d %H"), t)].append(u)
        by_day[(stamp.strftime("%Y-%m-%d"), t)].append(u)
    expect = {}
    for (period, t), users in by_hour.items():
        _, ss, nz = _hll_parts(users, M, S)
        expect[("hour", period, t)] = (ss, nz)
    for (period, t), users in by_day.items():
        _, ss, nz = _hll_parts(users, M, S)
        expect[("day", period, t)] = (ss, nz)
    assert got == expect


# ---------------------------------------------------------------------------
# approx aggregates (plans/olap_extras.py)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(ev_strategy)
def test_approx_aggregates_oracle_matches_python_sketches(raw):
    from bigdata_spark_realtime_spark.plans.ext_sketch import M, S
    from bigdata_spark_realtime_spark.plans.olap_extras import (
        _HLL_NUM,
        _LC_TABLE,
        _LC_THRESH,
        APPROX_ORACLE,
    )

    rows = _mk_rows(raw)
    con = _events_con(rows)
    got = {
        r.event_type: (
            r.approx_users,
            None
            if isinstance(r.approx_median_value, float)
            and math.isnan(r.approx_median_value)
            else r.approx_median_value,
        )
        for r in con.sql(APPROX_ORACLE).df().itertuples()
    }
    users_by_type: dict = defaultdict(list)
    v100_by_type: dict = defaultdict(list)
    for _, _, u, t, v in rows:
        users_by_type[t].append(u)
        if v > 0:
            v100_by_type[t].append(math.floor(v * 100))
    expect = {}
    for t, users in users_by_type.items():
        _, ss, nz = _hll_parts(users, M, S)
        if ss >= _LC_THRESH and nz < M:
            approx_users = _LC_TABLE[M - nz - 1]  # list_extract is 1-based
        else:
            approx_users = math.floor(_HLL_NUM / ss)
        median = None
        if v100_by_type[t]:
            cnts = Counter(_octave_bucket(v) for v in v100_by_type[t])
            total = sum(cnts.values())
            cum = 0
            for bkt in sorted(cnts):
                cum += cnts[bkt]
                if 2 * cum >= total:
                    mbkt = bkt
                    break
            m2 = (
                2 * mbkt + 1
                if mbkt < 8
                else (2 * (mbkt & 7) + 1) << ((mbkt >> 3) - 3)
            )
            median = m2 / 200.0
        expect[t] = (approx_users, median)
    assert got == expect


# ---------------------------------------------------------------------------
# event-feed contract audit (plans/ext_contract.py EVENT_RULES)
# ---------------------------------------------------------------------------

contract_strategy = st.lists(
    st.tuples(
        st.integers(0, 800),          # hours: crosses the Jan-25 ts bound
        st.integers(0, 3_599),
        st.integers(1, 5),
        st.sampled_from(["click", "view", "purchase", "bogus"]),
        st.integers(-100, 9_999),     # cents: <= 0 violates value_positive
        st.booleans(),                # user_id NULL mask
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None)
@given(contract_strategy)
def test_event_contract_audit_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_contract import (
        _TS_BOUND_US,
        EVENT_CONTRACT_ORACLE,
        EVENT_RULES,
    )

    rows = [
        (i + 1, T0 + h * HOUR_US + s * 1_000_000, u, t, cents / 100.0)
        for i, (h, s, u, t, cents, _null) in enumerate(raw)
    ]
    mask = [null for *_, null in raw]
    con = _events_con(rows, user_null_mask=mask)
    # first_bad_key is NULL for clean rules: pandas coerces the BIGINT
    # column to float64/NaN, so normalize back to Optional[int]
    got = {
        r.rule: (
            r.n_checked,
            r.n_violations,
            None if pd.isna(r.first_bad_key) else int(r.first_bad_key),
        )
        for r in con.sql(EVENT_CONTRACT_ORACLE).df().itertuples()
    }
    domain = {"click", "error", "purchase", "signup", "view"}
    checks = {
        "type_in_domain": lambda eid, us, u, t, v: t in domain,
        "user_not_null": lambda eid, us, u, t, v: u is not None,
        "value_positive": lambda eid, us, u, t, v: v > 0,
        "ts_before_jan25": lambda eid, us, u, t, v: us < _TS_BOUND_US,
    }
    assert set(checks) == set(EVENT_RULES)
    expect = {}
    for rule, ok in checks.items():
        bad = [
            eid
            for (eid, us, u, t, v), null in zip(rows, mask)
            if not ok(eid, us, None if null else u, t, v)
        ]
        expect[rule] = (len(rows), len(bad), min(bad) if bad else None)
    assert got == expect
