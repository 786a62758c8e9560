"""Prefix-filter set-similarity join: completeness vs brute force.

The oracle mirror proves completeness on the fixture corpus; this test
proves it on adversarial synthetic sets — tiny universes (every pair
collides somewhere), singleton sets, and a 300-copy identical block
that overflows MAX_BUCKET_COLLECT so the oversize-bucket join path is
exercised, at two different thresholds.
"""

from __future__ import annotations

import random

from pyspark.sql import types as T

from bigdata_spark_realtime_spark.plans.ext_setjoin import setsim_join

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shingles", T.ArrayType(T.StringType())),
    ]
)


def _brute(rows, tau_num, tau_den):
    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (a, sa), (b, sb) = rows[i], rows[j]
            inter = len(sa & sb)
            union = len(sa | sb)
            if union and tau_den * inter >= tau_num * union:
                want.add((min(a, b), max(a, b)))
    return want


def _sets(seed):
    rng = random.Random(seed)
    universe = [f"u{k}" for k in range(12)]
    rows = []
    for d in range(120):
        s = frozenset(rng.sample(universe, rng.randint(1, 8)))
        rows.append((d, s))
    # degenerate block: 300 identical sets -> one prefix bucket of 300
    # rows (> MAX_BUCKET_COLLECT=256), forcing the equi-join fallback
    block = frozenset(["dup1", "dup2", "dup3"])
    rows += [(1000 + d, block) for d in range(300)]
    return rows


def test_setsim_join_matches_brute_force(spark):
    for tau_num, tau_den in ((3, 5), (4, 5)):
        rows = _sets(seed=tau_den * 17 + tau_num)
        df = spark.createDataFrame(
            [(d, sorted(s)) for d, s in rows], SCHEMA
        ).repartition(8)
        got = {
            (r.doc_a, r.doc_b)
            for r in setsim_join(df, tau_num, tau_den).collect()
        }
        assert got == _brute(rows, tau_num, tau_den)
