"""Semantic contracts for decontamination and sequence packing.

Cross-engine equivalence rides tests/test_queries_oracle.py; here we
pin the operators' defining properties on planted inputs.
"""

from __future__ import annotations

import pandas as pd

from bigdata_spark_realtime_spark.plans.ext_decontam import (
    CONTAM_W,
    EVAL_SOURCE,
    decontaminate,
)
from bigdata_spark_realtime_spark.plans.ext_packing import (
    N_SHARDS,
    PACK_BUDGET,
    ext_pack_shards,
)


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_planted_contamination_detected(spark):
    """A corpus doc embedding CONTAM_W consecutive eval tokens is
    flagged; one sharing only CONTAM_W-1 tokens is not."""
    eval_tokens = [f"ev{i}" for i in range(20)]
    rows = [
        (1, EVAL_SOURCE, " ".join(eval_tokens)),
        # full 8-gram lifted from the middle of the eval doc
        (2, "srcX", "a b c " + " ".join(eval_tokens[5 : 5 + CONTAM_W]) + " x y"),
        # only 7 consecutive eval tokens — below the window, clean
        (3, "srcX", "a b c " + " ".join(eval_tokens[5 : 5 + CONTAM_W - 1]) + " x y"),
        # no overlap at all
        (4, "srcX", " ".join(f"w{i}" for i in range(20))),
    ]
    got = {r["doc_id"]: r["n_hits"] for r in decontaminate(_docs_df(spark, rows)).collect()}
    assert 2 in got and got[2] == 1
    assert 3 not in got
    assert 4 not in got


def test_eval_docs_never_flag_themselves(spark):
    """Eval-source documents are excluded from the corpus side — an
    eval doc must not appear in the output even though it trivially
    shares all its shingles with the eval set."""
    text = " ".join(f"t{i}" for i in range(CONTAM_W + 4))
    rows = [(1, EVAL_SOURCE, text), (2, EVAL_SOURCE, text)]
    assert decontaminate(_docs_df(spark, rows)).count() == 0


def test_packing_offsets_are_cumulative_and_deterministic(spark, sf_dir, duck):
    got = ext_pack_shards(spark, sf_dir).toPandas()
    n_chars = duck.sql("SELECT doc_id, n_chars FROM documents").df()
    df = got.merge(n_chars, on="doc_id")
    assert set(df["shard"]) <= set(range(N_SHARDS))
    # every document's pack is exactly floor(start/budget)
    assert (df["pack_id"] == df["start_offset"] // PACK_BUDGET).all()
    # within each shard, offsets are an exact prefix sum in pack order
    for shard, grp in df.sort_values(["shard", "start_offset", "doc_id"]).groupby(
        "shard"
    ):
        expected = grp["n_chars"].cumsum().shift(fill_value=0)
        assert (grp["start_offset"].values == expected.values).all(), shard
    # deterministic across runs
    again = ext_pack_shards(spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True),
    )
