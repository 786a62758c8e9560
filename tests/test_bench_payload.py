"""bench.py payload semantics: a partial run can never out-score a clean one."""

from __future__ import annotations

import json

from bench import HEADLINE, build_payload


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


def test_headline_names_are_registered():
    from bigdata_spark_realtime_spark.plans import registry

    specs = registry.load_all()
    missing = [n for n in HEADLINE if n not in specs]
    assert not missing, f"HEADLINE references unregistered queries: {missing}"
    # the REST serving surface must keep a tracked latency (round-6 task)
    assert "serving_detail_by_item" in HEADLINE
    assert "a2_hourly_counts_topk" in HEADLINE
