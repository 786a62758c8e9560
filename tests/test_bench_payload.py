"""bench.py payload semantics: a partial run can never out-score a clean one."""

from __future__ import annotations

import json

from bench import HEADLINE, aggregate_passes, build_payload


def test_clean_run_reports_sum():
    p = build_payload({"a": 1.0, "b": 2.5}, {}, "/root/testdata/sf0.1")
    assert p["value"] == 3.5
    assert p["sf"] == 0.1
    assert "errors" not in p and "partial_sum_sec" not in p


def test_failed_query_nulls_value():
    p = build_payload({"a": 1.0}, {"b": "Boom()"}, "/root/testdata/sf0.1")
    assert p["value"] is None
    assert p["errors"] == {"b": "Boom()"}
    assert p["partial_sum_sec"] == 1.0
    # and the payload stays one parseable JSON object
    assert json.loads(json.dumps(p))["value"] is None


def test_min_of_passes_is_contention_robust():
    # pass 2 ran under a load spike (every query 6x slower) — the
    # reported timing must be the uncontended pass, per query
    t, errors, flaky = aggregate_passes(
        ["a", "b"],
        [{"a": 1.0, "b": 2.0}, {"a": 6.0, "b": 12.0}],
        {},
        {},
        2,
    )
    assert t == {"a": 1.0, "b": 2.0}
    assert not errors and not flaky


def test_flaky_query_keeps_surviving_timing_and_total():
    # fails pass 1, succeeds pass 2: previously this nulled the whole
    # total; now it reports the good timing and flags the query flaky
    t, errors, flaky = aggregate_passes(
        ["a", "b"],
        [{"a": 1.0}, {"a": 1.1, "b": 3.0}],
        {"b": 1},
        {"b": "Boom()"},
        2,
    )
    assert t == {"a": 1.0, "b": 3.0}
    assert not errors
    assert flaky == {"b": "Boom()"}
    assert build_payload(t, errors, "/root/testdata/sf0.1")["value"] == 4.0


def test_always_failing_query_nulls_value():
    t, errors, flaky = aggregate_passes(
        ["a", "b"], [{"a": 1.0}, {"a": 1.0}], {"b": 2}, {"b": "Boom()"}, 2
    )
    assert errors == {"b": "Boom()"} and not flaky
    assert build_payload(t, errors, "/root/testdata/sf0.1")["value"] is None


def test_headline_names_are_registered():
    from bigdata_spark_realtime_spark.plans import registry

    specs = registry.load_all()
    missing = [n for n in HEADLINE if n not in specs]
    assert not missing, f"HEADLINE references unregistered queries: {missing}"
    # the REST serving surface must keep a tracked latency (round-6 task)
    assert "serving_detail_by_item" in HEADLINE
    assert "a2_hourly_counts_topk" in HEADLINE


# ---------------------------------------------------------------------------
# build_compact_line degradation cascade (round-13): for ANY payload the
# stdout line must stay parseable and within the driver's tail window
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_names = st.text(alphabet="abcdefghij_", min_size=3, max_size=40)


@settings(max_examples=60, deadline=None)
@given(
    timings=st.dictionaries(_names, st.floats(0.0, 9999.0), max_size=200),
    errs=st.dictionaries(_names, st.text(max_size=400), max_size=20),
    value=st.one_of(st.none(), st.floats(0.0, 99999.0)),
)
def test_compact_line_always_fits_and_parses(timings, errs, value):
    import json

    import bench

    payload = {
        "metric": "headline query wall-clock",
        "unit": "sec",
        "sf": 0.1,
        "loadavg_1m": [1.0, 2.0],
        "value": value,
    }
    if errs:
        payload["errors"] = errs
        payload["partial_sum_sec"] = 1.0
    line = bench.build_compact_line(payload, timings)
    assert len(line) <= bench.COMPACT_LINE_LIMIT
    parsed = json.loads(line)
    assert parsed["metric"] == payload["metric"]
    assert parsed["value"] == (None if value is None else value)
    # elision is an explicit count, never silent
    n_shown = len(parsed.get("queries", {}))
    assert n_shown + parsed.get("queries_elided", 0) == len(timings)


def test_calibration_probe_recorded_in_run_records(tmp_path):
    """Round-14 judge task #7: every merged run record must carry the
    md5 host-speed probe so cross-round comparisons can be normalized
    mechanically instead of re-litigating host-vs-code attribution."""
    import bench

    rate = bench.md5_calibration_probe(seconds=0.05)
    assert rate > 10_000  # any non-pathological host clears this easily

    (tmp_path / "CORRECTNESS_r14.json").write_text("{}")
    payload = {
        "metric": "m", "unit": "sec", "sf": 0.1, "value": 1.0,
        "loadavg_1m": [1.0, 1.0],
        "calib": {"md5_per_s_1core": [rate, rate]},
    }
    doc = bench.merge_round_artifact(str(tmp_path), payload, {"a": 1.0})
    assert doc["runs"][-1]["calib"]["md5_per_s_1core"] == [rate, rate]
