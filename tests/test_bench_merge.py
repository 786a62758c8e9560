"""bench.py round-artifact merge: the clean-load evidence must be
clobber-proof (round-11 judge task #5 — the driver's contended
post-snapshot run used to overwrite BENCH_LOCAL.json and destroy the
round's clean numbers in the working tree)."""

from __future__ import annotations

import json
import os

import bench


def _mk_repo(tmp_path, rounds=(11,)):
    for r in rounds:
        (tmp_path / f"CORRECTNESS_r{r:02d}.json").write_text("{}")
    return str(tmp_path)


def test_current_round_is_one_past_latest_artifact(tmp_path):
    assert bench.current_round(_mk_repo(tmp_path, rounds=(1, 7, 11))) == 12
    assert bench.current_round(str(tmp_path / "empty")) == 0


def test_merge_keeps_per_query_min_across_runs(tmp_path):
    repo = _mk_repo(tmp_path)
    clean = {"metric": "m", "unit": "sec", "sf": 0.1, "value": 10.0,
             "loadavg_1m": [2.0, 2.3]}
    doc = bench.merge_round_artifact(repo, clean, {"a": 4.0, "b": 6.0})
    assert doc["round"] == 12 and doc["value"] == 10.0

    # a later CONTENDED run (slower everywhere) must not displace the
    # clean evidence: best_queries keeps the clean mins
    contended = {"metric": "m", "unit": "sec", "sf": 0.1, "value": 14.0,
                 "loadavg_1m": [6.1, 6.0]}
    doc = bench.merge_round_artifact(repo, contended, {"a": 8.0, "b": 6.0})
    assert doc["best_queries"] == {"a": 4.0, "b": 6.0}
    assert doc["value"] == 10.0
    assert len(doc["runs"]) == 2  # raw records both preserved

    # the artifact on disk agrees with the returned doc
    on_disk = json.load(open(os.path.join(repo, "BENCH_LOCAL_r12.json")))
    assert on_disk == doc


def test_merge_composite_improves_when_later_run_is_faster(tmp_path):
    repo = _mk_repo(tmp_path)
    bench.merge_round_artifact(
        repo, {"metric": "m", "unit": "sec", "sf": 0.1, "value": 10.0},
        {"a": 4.0, "b": 6.0})
    doc = bench.merge_round_artifact(
        repo, {"metric": "m", "unit": "sec", "sf": 0.1, "value": 9.0},
        {"a": 5.0, "b": 4.0})
    assert doc["best_queries"] == {"a": 4.0, "b": 4.0}
    assert doc["value"] == 8.0


def test_merge_value_stays_null_until_a_clean_run(tmp_path):
    """Same never-looks-better-after-a-regression rule as build_payload:
    runs where some query failed every pass carry value=None, and the
    round composite must not synthesize a total from partial runs."""
    repo = _mk_repo(tmp_path)
    partial = {"metric": "m", "unit": "sec", "sf": 0.1, "value": None,
               "errors": {"a": "boom"}}
    doc = bench.merge_round_artifact(repo, partial, {"b": 5.0})
    assert doc["value"] is None
    assert doc["runs"][0]["errors"] == {"a": "boom"}
    # a clean run arrives: composite becomes real
    doc = bench.merge_round_artifact(
        repo, {"metric": "m", "unit": "sec", "sf": 0.1, "value": 11.0},
        {"a": 6.0, "b": 5.0})
    assert doc["value"] == 11.0
    assert doc["best_queries"] == {"a": 6.0, "b": 5.0}
