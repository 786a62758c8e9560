"""Connected-components keeper resolution (operators/components.py)."""

from __future__ import annotations

import pytest

from bigdata_spark_realtime_spark.operators.components import (
    connected_components,
    resolve_keepers,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_chain_triangle_and_isolated(spark):
    # chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)])
    comp = {r.id: r.component for r in connected_components(edges, "a", "b").collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_long_chain_converges(spark):
    n = 20  # worst case for min propagation: one long path
    edges = _edges(spark, [(i, i + 1) for i in range(n)])
    comp = connected_components(edges, "a", "b")
    assert comp.where("component != 0").count() == 0
    assert comp.count() == n + 1


def test_cap_raises_instead_of_wrong_labels(spark):
    edges = _edges(spark, [(i, i + 1) for i in range(10)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, "a", "b", max_rounds=2)


def test_resolve_keepers_includes_isolated_docs(spark):
    all_ids = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    edges = _edges(spark, [(2, 5), (5, 6)])
    out = {r.doc_id: r.keeper_id for r in
           resolve_keepers(all_ids, "doc_id", edges, "a", "b").collect()}
    assert out == {1: 1, 2: 2, 3: 3, 4: 4, 5: 2, 6: 2, 7: 7}
    survivors = {d for d, k in out.items() if d == k}
    assert survivors == {1, 2, 3, 4, 7}
