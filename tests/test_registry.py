"""Registry gate hygiene: the correctness gate's query set must not be
able to shrink silently (round-2 judge task #8)."""

from __future__ import annotations

import os

import pytest

from bigdata_spark_realtime_spark.plans import registry

#: registered queries per plan module — update when adding operators;
#: a mismatch here means a module stopped registering (import typo,
#: accidental deletion) and the DRIVER GATE would silently shrink
EXPECTED_PER_MODULE = {
    "tpch": 22,
    "transforms": 6,
    "scalar_fns": 7,
    "dedup": 2,
    "joins": 6,
    "aggregations": 6,
    "sort_limit": 3,
    "windows": 1,
    "analytic": 6,
    "sessionize": 3,
    "olap_extras": 2,
    "serving": 4,
    "ext_dedup": 7,
    "ext_similarity": 2,
    "ext_text": 4,
    # frames/resize are DEFINED in ext_multimodal (so fn.__module__
    # counts them there) but REGISTERED by the ext_media_tail shim so
    # they land after the pinned round-6 gate window
    "ext_multimodal": 9,
    "ext_media_tail": 0,
    "ext_media_tail2": 0,
    # transitions_daily is DEFINED in ext_funnel (fn.__module__ counts
    # it there) but REGISTERED by the ext_funnel_tail shim so it lands
    # after the pinned round-9 gate window
    "ext_funnel_tail": 0,
    "ext_attrib": 1,
    "ext_snapshot": 1,
    "ext_sketch_window": 1,
    "ext_colloc": 1,
    "ext_skewcheck": 1,
    "ext_graphrank": 1,
    "ext_split": 1,
    "ext_triplets": 1,
    "ext_annops": 2,
    "ext_scd2": 1,
    "ext_anomaly": 1,
    "ext_dedup_impact": 1,
    "ext_sampling_tail": 0,
    "ext_stream_tail2": 1,
    "ext_pit": 1,
    "ext_setjoin": 1,
    "ext_binning": 1,
    "ext_contract": 2,
    "ext_timeseries": 4,
    "ext_graphtri": 1,
    "ext_fuzzy": 1,
    "ext_timeseries2": 2,
    "ext_concurrency": 1,
    "ext_sampling2": 1,
    "ext_sketch2": 2,
    "ext_fkaudit": 1,
    # session_paths_daily is DEFINED in ext_paths (fn.__module__ counts
    # it there) but REGISTERED by the ext_paths_daily head shim so it
    # seats at r11 window slot 48 without splicing ext_paths' own slots
    "ext_paths": 3,
    "ext_paths_daily": 0,
    "ext_zorder": 1,
    "ext_embaudit": 2,
    "ext_drift": 2,
    "ext_communities": 1,
    "ext_convert": 1,
    "ext_stream_tail3": 5,
    "ext_windows2": 4,
    "ext_decay": 2,
    "ext_rolling": 3,
    "ext_cohortval": 2,
    "ext_stream_tail4": 3,
    "ext_rangejoin": 1,
    "ext_rollup": 1,
    "ext_sketch_tail": 2,
    "ext_funnel": 6,
    "ext_asof": 1,
    "ext_sampling": 4,
    "ext_srp": 1,
    "ext_decontam": 1,
    "ext_packing": 1,
    "ext_ivf": 1,
    "ext_quality": 4,
    "ext_semantic": 1,
    "ext_mixture": 2,
    "ext_pii": 1,
    "ext_lm": 1,
    "ext_substring": 1,
    "ext_tfidf": 1,
    "ext_order": 1,
    "ext_chunk": 1,
    "ext_profile": 2,
    "ext_curation3": 1,
    "ext_bm25": 1,
    "ext_hybrid": 1,
    "ext_sketch": 2,
    "ext_dsir": 1,
    "ext_bpe": 2,
    "ext_stream_tail": 5,
    "ext_embed": 4,
    "ext_vocab": 2,
    "streaming_queries": 17,
    "ext_nullprobe": 1,
    "ext_stream_tail5": 2,
    "ext_approx_audit": 2,
    "ext_stream_tail6": 1,
    "ext_approx_audit2": 2,
    "ext_approx_audit3": 3,
    "ext_urlnorm": 1,
    "ext_stream_tail7": 2,
}

#: queries registered since the last executed rotation, AFTER the
#: pinned window (splice rule). The freshness mirror tolerates exactly
#: these having no driver row; upcoming rotations must move them into
#: a window and empty this set. The three round-13 late additions
#: (ext_approx_audit + ext_stream_tail6) seated in the executed R15
#: window (slots 11-12, 17); the five round-14 approximation-quality
#: audits (ext_approx_audit2/3) and the three round-15 additions
#: (URL-canonicalization dedup + the serving-stats intake twins) seat
#: in R16 (plans/ROTATION_R16.md).
PENDING_FIRST_DRIVER_ROW: set[str] = {
    "ext_semantic_gap_audit",
    "ext_simhash_error_audit",
    "ext_hll_error_audit",
    "ext_quantile_error_audit",
    "ext_srp_error_audit",
    "ext_dedup_url",
    "stream_stats_by_item_age",
    "stream_stats_by_item_gender",
}

#: The exact first-50 registration window the round-15 external
#: correctness gate sees: the refresh rotation planned in round 14
#: (plans/ROTATION_R15.md, deleted in the rotation commit). First
#: driver rows for the round-13 late additions (R15_TARGETS, slots
#: 11-12 and 17); every round-14 body-drift row retires (ext_dedup
#: seven at 2-8, ext_embed four at 20-23, ext_annops pair at 19/24,
#: olap_extras pair at 27-28, fourteen streaming_queries twins
#: re-bodied by the r14 replay migration), plus ext_pii_redact
#: (slot 1, last pre-r9 survivor). Import drags counted:
#: ext_approx_audit→ext_dedup (2-8) + ext_similarity (9-10),
#: ext_stream_tail6→ext_funnel (13-16), ext_annops→ext_ivf (18),
#: olap_extras→ext_sketch (25-26), streaming_queries' oracle
#: builders→ext_sampling/ext_decontam/ext_lm/ext_snapshot/ext_attrib/
#: ext_skewcheck. The four fixture-replay twins spill to slots 51-54
#: (r12 greens, bodies unchanged in r14).
#: If this test goes red you reordered _PLAN_MODULES or registered a
#: query ahead of the window — both silently change what the external
#: gate verifies; update this list ONLY as a deliberate rotation.
R15_WINDOW = [
    "ext_pii_redact", "ext_dedup_exact", "ext_dedup_minhash_lsh",
    "ext_dedup_resolve", "ext_dedup_ngram_jaccard", "ext_dedup_simhash",
    "ext_dedup_embedding", "ext_dedup_simhash_pairs",
    "ext_ann_bruteforce_topk", "ext_ann_bucketed_topk",
    "ext_ann_recall_eval", "ext_minhash_error_audit", "ext_funnel_steps",
    "ext_retention_cohorts", "ext_item_cooccurrence",
    "ext_event_transitions", "stream_funnel_steps", "ext_ann_ivf_topk",
    "ext_ivf_cell_stats", "ext_embed_quantize_int8", "ext_embed_centroids",
    "ext_kmeans_assign", "ext_centroid_similarity", "stream_kmeans_assign",
    "ext_hll_distinct", "ext_cms_freq", "rollup_region_nation",
    "approx_aggregates", "stream_windowed_counts", "stream_dedup_dau_keys",
    "stream_sessionize_gap", "ext_sample_stratified",
    "ext_curation_pipeline", "ext_sample_source_cap",
    "stream_stratified_sample", "ext_decontaminate", "stream_decontaminate",
    "stream_dedup_minhash", "ext_lm_score", "stream_lm_bucket",
    "stream_hll_distinct", "stream_cms_freq", "stream_retention_cohorts",
    "ext_snapshot_diff", "stream_snapshot_diff",
    "ext_range_join_attribution", "ext_multitouch_attribution",
    "stream_multitouch_attribution", "ext_skew_audit", "stream_skew_audit",
]

#: the 3 rows this window exists to give FIRST driver rows (round-13
#: late surface growth) — asserted as a subset so a future splice can't
#: silently evict one while keeping the list length at 50
R15_TARGETS = {
    "ext_ann_recall_eval", "ext_minhash_error_audit", "stream_funnel_steps",
}

#: stable alias for dependents (test_partition_invariance.py): each
#: rotation rebinds this to the new R{N}_TARGETS so importers survive
#: the rename
CURRENT_ROTATION_TARGETS = R15_TARGETS


def test_r15_gate_window_is_pinned():
    """The first 50 registered queries — what the external gate checks —
    must be exactly the planned r15 window, in order.

    Asserted in a FRESH interpreter: the gate runs a fresh process, and
    in-process pytest ordering is polluted — any earlier test module
    that imports a plan module (e.g. test_decontam_packing importing
    ext_decontam) registers its queries ahead of load_all's canonical
    module walk."""
    import json
    import subprocess
    import sys

    assert len(R15_WINDOW) == 50
    assert len(R15_TARGETS) == 3
    assert R15_TARGETS <= set(R15_WINDOW)
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import json; from bigdata_spark_realtime_spark.plans import registry; "
            "print(json.dumps(list(registry.load_all())[:50]))",
        ],
        capture_output=True,
        text=True,
        check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got == R15_WINDOW


def test_helper_imports_register_nothing():
    """plans.corpus is the shared-helper home precisely so importing a
    helper can't drag query registrations into the gate window."""
    import importlib

    mod = importlib.import_module("bigdata_spark_realtime_spark.plans.corpus")
    assert not any(
        callable(v) and getattr(v, "__module__", "").endswith("registry")
        for v in vars(mod).values()
    )
    specs = registry.load_all()
    assert not any(
        s.fn.__module__.endswith("plans.corpus") for s in specs.values()
    )


def test_per_module_registered_query_counts():
    from collections import Counter

    specs = registry.load_all()
    got = Counter(s.fn.__module__.rsplit(".", 1)[-1] for s in specs.values())
    # zero-count entries are registration shims (queries defined in one
    # module, registered from another to stay out of the gate window)
    assert dict(got) == {k: v for k, v in EXPECTED_PER_MODULE.items() if v}
    assert sum(got.values()) == sum(EXPECTED_PER_MODULE.values()) == len(specs)


def test_every_plan_module_is_scanned():
    scanned = {m.rsplit(".", 1)[-1] for m in registry._PLAN_MODULES}
    assert scanned == set(EXPECTED_PER_MODULE)


def test_missing_module_fails_loudly(monkeypatch):
    monkeypatch.setattr(
        registry,
        "_PLAN_MODULES",
        registry._PLAN_MODULES + ("bigdata_spark_realtime_spark.plans.nope_typo",),
    )
    with pytest.raises(ModuleNotFoundError):
        registry.load_all()


def test_never_driver_verified_queries_are_inside_gate_window():
    """Freshness mirror (round-7 judge task #7): every registered query
    that has NO driver-verified row in any CORRECTNESS_r*.json must sit
    inside the CURRENT first-50 gate window, so the next driver run
    retires it. Round 7 silently skipped the planned rotation and the
    only flag was the judge; this makes that failure mode a local red.

    "Verified" = hash-green row, or a rows-only row for the declared
    ``oracle=None`` queries. FAIL rows do not count as verified."""
    import glob
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    verified: set[str] = set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        for name, row in json.load(open(path)).items():
            if row.get("hash_match") or row.get("err") == "no_oracle":
                verified.add(name)
    assert verified, "no CORRECTNESS_r*.json artifacts found"
    never = set(registry.load_all()) - verified
    stragglers = never - set(R15_WINDOW) - PENDING_FIRST_DRIVER_ROW
    assert not stragglers, (
        f"queries with no driver row are OUTSIDE the gate window — "
        f"rotate them in (or declare in PENDING_FIRST_DRIVER_ROW if "
        f"registered after the current window was pinned): "
        f"{sorted(stragglers)}"
    )


def test_bench_headline_names_are_all_registered():
    """bench.py silently drops HEADLINE names missing from the registry
    (`[n for n in HEADLINE if n in specs]`), so a renamed query would
    shrink the benchmark and flatter the total without any error."""
    import bench

    specs = registry.load_all()
    missing = [n for n in bench.HEADLINE if n not in specs]
    assert not missing, missing
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate headline"


def test_bench_compact_stdout_line_fits_driver_tail_window():
    """The round driver's BENCH_r{N}.json parses only when bench.py's
    stdout JSON line fits its 2000-char tail capture (r8-r10 landed
    parsed=null after the line outgrew it). Pin the REAL builder
    (bench.build_compact_line) against a worst-case regression run —
    every HEADLINE query at 99.99 s, plus errors/flaky keys with
    full-length 300-char reprs — exactly the run where the parsed
    artifact matters most (round-12 advisor: the old 9.99 synthetic
    missed this). The builder must degrade (clip reprs, drop loadavg,
    coarsen/elide timings) rather than emit an unparseable line."""
    import json

    import bench

    worst_timings = {n: 99.99 for n in bench.HEADLINE}
    payload = {
        "metric": "headline query wall-clock",
        "unit": "sec",
        "sf": 0.1,
        "loadavg_1m": [99.99, 99.99],
        "value": None,
        "partial_sum_sec": 9999.999,
        "errors": {n: "x" * 300 for n in list(bench.HEADLINE)[:3]},
        "flaky": {n: "y" * 300 for n in list(bench.HEADLINE)[3:6]},
    }
    line = bench.build_compact_line(payload, worst_timings)
    assert len(line) <= bench.COMPACT_LINE_LIMIT < 1990
    parsed = json.loads(line)  # stays one parseable JSON object
    assert parsed["value"] is None and parsed["sf"] == 0.1
    assert set(parsed["errors"]) == set(list(bench.HEADLINE)[:3])

    # the everyday clean run keeps full per-query detail un-degraded
    clean = {
        "metric": "headline query wall-clock",
        "unit": "sec",
        "sf": 0.1,
        "loadavg_1m": [1.0, 1.2],
        "value": 42.0,
    }
    timings = {n: 1.234 for n in bench.HEADLINE}
    parsed = json.loads(bench.build_compact_line(clean, timings))
    assert parsed["queries"] == {n: 1.23 for n in bench.HEADLINE}
    assert "queries_elided" not in parsed and "loadavg_1m" in parsed
