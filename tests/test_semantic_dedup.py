"""SemDeDup kernel semantics + oversized-cell splitting."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.operators.similarity import split_oversized_cells
from bigdata_spark_realtime_spark.operators.vector_ops import semantic_dedup_drops


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "cell long, vec_id long, embedding array<double>"
    )


def test_planted_duplicates_dropped_first(spark):
    # cell 0: ids 1/2 are near-identical, 3/4/5 are spread out.
    # eps=0.2 over n=5 -> ceil(1) = 1 drop: the lower-id member of the
    # duplicate pair wins the (max_sim DESC, vec_id ASC) rank.
    rows = [
        (0, 1, [1.0, 0.0, 0.0]),
        (0, 2, [0.999, 0.01, 0.0]),
        (0, 3, [0.0, 1.0, 0.0]),
        (0, 4, [0.0, 0.0, 1.0]),
        (0, 5, [0.5, -0.5, 0.7]),
    ]
    got = semantic_dedup_drops(_frame(spark, rows), eps=0.2).collect()
    assert [(r.cell, r.vec_id) for r in got] == [(0, 1)]
    assert got[0].max_sim == pytest.approx(1.0, abs=1e-3)


def test_drop_count_is_ceil_eps_n_per_cell(spark):
    # 7 vectors in one cell, eps=0.3 -> ceil(2.1) = 3 drops
    rows = [(0, i, [float(i), 1.0, 0.5 * i]) for i in range(7)]
    got = semantic_dedup_drops(_frame(spark, rows), eps=0.3).collect()
    assert len(got) == math.ceil(0.3 * 7)


def test_singleton_cell_drops_nothing(spark):
    rows = [(0, 1, [1.0, 0.0]), (1, 2, [0.0, 1.0])]
    assert semantic_dedup_drops(_frame(spark, rows), eps=0.9).count() == 0


def test_split_oversized_cells_bounds_group_size(spark):
    # one 40-row cell, max_cell=10 -> ceil(40/10)=4 sub-cells, each
    # small enough; ids stay namespaced under the original cell
    emb = _frame(spark, [(3, i, [float(i % 5), 1.0]) for i in range(40)])
    split = split_oversized_cells(emb, max_cell=10)
    sizes = split.groupBy("cell").count().collect()
    assert all(r.cell // 1_000_000 == 3 for r in sizes)
    assert {r.cell % 1_000_000 for r in sizes} <= {0, 1, 2, 3}
    # hash-balanced, not exact: every sub-cell must still be far under
    # the unsplit size (the OOM bound this helper exists for)
    assert max(r["count"] for r in sizes) < 25
    assert sum(r["count"] for r in sizes) == 40


def test_split_leaves_small_cells_alone_and_composes(spark):
    emb = _frame(spark, [(7, i, [1.0, float(i)]) for i in range(4)])
    split = split_oversized_cells(emb, max_cell=10)
    # n_sub = 1 -> every row lands in sub-cell 0 of cell 7
    assert split.select(F.collect_set("cell")).first()[0] == [7_000_000]
    # the kernel runs unchanged on the composite ids
    drops = semantic_dedup_drops(split, eps=0.5)
    assert drops.count() == math.ceil(0.5 * 4)
