"""Property-based contracts for the remaining replicable straggler
oracles (R12 window): retention cohorts and the FK audit. The dedup
trio (impact histogram, split leakage, triplets) rides the MinHash /
SimHash machinery whose recall and band math have their own dedicated
suites (test_dedup_recall.py, test_shingling_property.py) — a python
re-implementation here would duplicate those pins, so the trio is
covered by its planted fixtures plus the two-sf oracle mirrors.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from property_util import DAY_US, day_str, events_con, events_strategy, mk_rows

ev_strategy = events_strategy(max_hour=240)


@settings(max_examples=15, deadline=None)
@given(ev_strategy)
def test_retention_cohorts_oracle_matches_python_reference(raw):
    from bigdata_spark_realtime_spark.plans.ext_funnel import RETENTION_ORACLE

    rows = mk_rows(raw)
    con = events_con(rows)
    got = {
        (r.cohort_day, r.day_offset): r.n_users
        for r in con.sql(RETENTION_ORACLE).df().itertuples()
    }
    days: dict = defaultdict(set)
    for _, us, u, _t, _v in rows:
        days[u].add(us // DAY_US)
    grid: Counter = Counter()
    for u, ds in days.items():
        cohort = min(ds)
        for d in ds:
            grid[(cohort, d - cohort)] += 1
    expect = {
        (day_str(cd * DAY_US), off): n for (cd, off), n in grid.items()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# FK audit over a generated star schema (unique parent keys, per the
# PK contract both engines assume — the oracle joins the raw parent,
# the Spark side distincts it, so a duplicated PK is out of contract)
# ---------------------------------------------------------------------------

fk_strategy = st.tuples(
    st.lists(st.integers(1, 8), min_size=1, max_size=15),   # orders custkeys
    st.sets(st.integers(1, 8), min_size=1),                  # customer keys
    st.lists(
        st.tuples(st.integers(1, 15), st.integers(1, 8), st.integers(1, 6)),
        min_size=1,
        max_size=25,
    ),                                                       # lineitem fks
    st.sets(st.integers(1, 8), min_size=1),                  # part keys
    st.sets(st.integers(1, 6), min_size=1),                  # supplier keys
    st.sets(st.integers(0, 4), min_size=1),                  # nation keys
)


@settings(max_examples=15, deadline=None)
@given(fk_strategy)
def test_fk_audit_oracle_matches_python_reference(data):
    from bigdata_spark_realtime_spark.plans.ext_fkaudit import FK_AUDIT_ORACLE

    o_cust, custs, li, parts, supps, nations = data
    custs = sorted(custs)
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": pd.Series(
                    range(1, len(o_cust) + 1), dtype="int64"
                ),
                "o_custkey": pd.Series(o_cust, dtype="int64"),
            }
        ),
    )
    con.register(
        "customer",
        pd.DataFrame(
            {
                "c_custkey": pd.Series(custs, dtype="int64"),
                "c_nationkey": pd.Series(
                    [k % 5 for k in custs], dtype="int64"
                ),
            }
        ),
    )
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": pd.Series([r[0] for r in li], dtype="int64"),
                "l_partkey": pd.Series([r[1] for r in li], dtype="int64"),
                "l_suppkey": pd.Series([r[2] for r in li], dtype="int64"),
            }
        ),
    )
    con.register(
        "part",
        pd.DataFrame({"p_partkey": pd.Series(sorted(parts), dtype="int64")}),
    )
    con.register(
        "supplier",
        pd.DataFrame({"s_suppkey": pd.Series(sorted(supps), dtype="int64")}),
    )
    con.register(
        "nation",
        pd.DataFrame(
            {"n_nationkey": pd.Series(sorted(nations), dtype="int64")}
        ),
    )
    got = {
        r.relation: (r.n_child, r.n_orphans, r.n_orphan_keys)
        for r in con.sql(FK_AUDIT_ORACLE).df().itertuples()
    }

    def audit(children, parents):
        orphans = [k for k in children if k not in parents]
        return (len(children), len(orphans), len(set(orphans)))

    okeys = set(range(1, len(o_cust) + 1))
    expect = {
        "orders->customer": audit(o_cust, set(custs)),
        "lineitem->orders": audit([r[0] for r in li], okeys),
        "lineitem->part": audit([r[1] for r in li], parts),
        "lineitem->supplier": audit([r[2] for r in li], supps),
        "customer->nation": audit([k % 5 for k in custs], nations),
    }
    assert got == expect
