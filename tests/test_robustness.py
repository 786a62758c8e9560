"""Malformed-input robustness: the reference's try-less parse crashes the
batch on bad JSON; the engine's PERMISSIVE from_json drops bad records
into the null-struct path instead (documented deviation — strictly more
robust)."""

from __future__ import annotations

from bigdata_spark_realtime_spark.streaming.base_db import parse_cdc, route_facts
from bigdata_spark_realtime_spark.streaming.base_log import split_base_log


def _raw(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "value string")


def test_base_log_survives_garbage(spark):
    good = '{"common":{"mid":"m1","uid":"1","ar":"2","ch":"c","is_new":"1","md":"m","os":"o","vc":"v","ba":"b"},"page":{"page_id":"home","during_time":5},"ts":1700000000000}'
    out = split_base_log(
        _raw(spark, [good, "not json at all", "{truncated", "", "42", "null"])
    )
    assert out["page"].count() == 1
    assert out["page"].first().mid == "m1"
    assert out["err"].count() == 0
    assert out["start"].count() == 0


def test_cdc_survives_garbage(spark):
    good = '{"type":"insert","table":"order_info","data":"{\\"id\\": 7}"}'
    cdc = parse_cdc(_raw(spark, [good, "garbage", "{", ""]))
    facts = route_facts(cdc)
    assert facts.count() == 1
    assert facts.first().topic == "DWD_ORDER_INFO_INSERT"
