"""Property-based check of the as-of join against a pure-python
reference: for EVERY randomly generated (left, right) pair, each left
row must carry the payload of the right row with the greatest time
at-or-before it (per key, inclusive), or nulls when none exists."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdata_spark_realtime_spark.operators.asof import asof_join

row = st.tuples(
    st.integers(0, 3),  # key (small domain → collisions guaranteed)
    st.integers(0, 20),  # time
)


def _reference(left, right):
    # right must be unique per (key, time): generator dedupes upstream
    out = set()
    by_key = {}
    for i, (k, t) in enumerate(right):
        by_key.setdefault(k, []).append((t, i))
    for lid, (k, t) in enumerate(left):
        cands = [(rt, i) for rt, i in by_key.get(k, []) if rt <= t]
        if cands:
            rt, i = max(cands)
            out.add((lid, 100 + i))
        else:
            out.add((lid, None))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    left=st.lists(row, min_size=1, max_size=12),
    right=st.lists(row, min_size=0, max_size=12, unique_by=lambda r: r),
)
def test_asof_matches_python_reference(spark, left, right):
    l_df = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, t long"
    )
    r_df = spark.createDataFrame(
        [(100 + i, k, t) for i, (k, t) in enumerate(right)],
        "payload long, rk long, rt long",
    ) if right else spark.createDataFrame([], "payload long, rk long, rt long")
    got = {
        (r.lid, r.payload)
        for r in asof_join(
            l_df, r_df, on=("k", "rk"), time=("t", "rt"), payload=["payload"]
        ).collect()
    }
    assert got == _reference(left, right)
