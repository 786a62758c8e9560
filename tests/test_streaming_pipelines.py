"""End-to-end Structured Streaming tests for the four reference pipelines.

Fixtures are replayed as real micro-batches (file source,
maxFilesPerTrigger=1 → multiple triggers) into memory sinks; results are
checked against pure-python ground truths computed from the same JSON —
independent of any Spark code path.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_spark_realtime_spark import schemas as S
from bigdata_spark_realtime_spark.sources import fixtures as FX
from bigdata_spark_realtime_spark.streaming.base_db import (
    parse_cdc,
    route_dims,
    route_facts,
)
from bigdata_spark_realtime_spark.streaming.base_log import split_base_log
from bigdata_spark_realtime_spark.streaming.dau import build_dau
from bigdata_spark_realtime_spark.streaming.order import (
    enrich_order_info,
    order_wide_join,
)

AGE_REF = "2024-03-01"


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("group2")
    FX.gen_raw_log(str(d / "raw_log"), n_rows=1200, n_files=4)
    FX.gen_cdc(str(d / "raw_cdc"), n_rows=600, n_files=3)
    FX.gen_dims(str(d / "dims"))
    meta = FX.gen_order_streams(str(d / "orders"), n_orders=200, n_files=5)
    (d / "meta.json").write_text(json.dumps(meta))
    return d


def _read_jsonl(path):
    rows = []
    for fn in sorted(os.listdir(path)):
        with open(os.path.join(path, fn)) as f:
            rows += [json.loads(line) for line in f if line.strip()]
    return rows


def _run_stream_to_memory(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()


def _dims(spark, fixture_dir):
    dim_user = spark.read.schema(S.DIM_USER_SCHEMA).json(
        str(fixture_dir / "dims" / "user_info")
    )
    dim_prov = spark.read.schema(S.DIM_PROVINCE_SCHEMA).json(
        str(fixture_dir / "dims" / "base_province")
    )
    return dim_user, dim_prov


# ---------------------------------------------------------------------------
# base_log multiplex split (T1-T7)
# ---------------------------------------------------------------------------


def test_base_log_stream_matches_batch_and_ground_truth(spark, fixture_dir):
    path = str(fixture_dir / "raw_log")
    raw_stream = spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(path)
    raw_batch = spark.read.format("text").load(path)

    stream_out, batch_out = split_base_log(raw_stream), split_base_log(raw_batch)
    for name, sdf in stream_out.items():
        _run_stream_to_memory(sdf, f"baselog_{name}")

    truth = _read_jsonl(path)
    n_err = sum(1 for r in truth if "err" in r)
    page_rows = [r for r in truth if "err" not in r and "page" in r]
    n_display = sum(len(r.get("displays", [])) for r in page_rows)
    n_action = sum(len(r.get("actions", [])) for r in page_rows)
    n_start = sum(1 for r in truth if "err" not in r and "start" in r)

    expected = {
        "err": n_err,
        "page": len(page_rows),
        "display": n_display,
        "action": n_action,
        "start": n_start,
    }
    for name, want in expected.items():
        got_stream = spark.sql(f"SELECT * FROM baselog_{name}")
        assert got_stream.count() == want, f"{name}: stream != ground truth"
        # stream == batch, row for row
        b = sorted(map(tuple, batch_out[name].collect()))
        s = sorted(map(tuple, got_stream.collect()))
        assert b == s, f"{name}: stream/batch divergence"

    # explode carries parent fields: every display row's mid exists among
    # its parent page rows
    mids = {r["common"]["mid"] for r in page_rows}
    got_mids = {r.mid for r in spark.sql("SELECT mid FROM baselog_display").collect()}
    assert got_mids <= mids


# ---------------------------------------------------------------------------
# DAU pipeline: entry filter → streaming dedup → dim enrich (D1/J1/J2)
# ---------------------------------------------------------------------------


def test_dau_stream_dedup_and_enrich(spark, fixture_dir):
    # full chain in one streaming query: raw log → split → page → DAU
    raw_stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(str(fixture_dir / "raw_log"))
    )
    page_stream = split_base_log(raw_stream)["page"]
    dim_user, dim_prov = _dims(spark, fixture_dir)
    dau = build_dau(page_stream, dim_user, dim_prov, AGE_REF, streaming=True)
    _run_stream_to_memory(dau, "dau_out")
    got = spark.sql("SELECT * FROM dau_out").collect()

    # ground truth: distinct (utc-date(ts), mid) over entry pages
    import datetime

    truth = _read_jsonl(str(fixture_dir / "raw_log"))
    entry = [
        r
        for r in truth
        if "err" not in r and "page" in r and r["page"].get("last_page_id") is None
    ]
    keys = {
        (
            datetime.datetime.fromtimestamp(
                r["ts"] / 1000, tz=datetime.timezone.utc
            ).strftime("%Y-%m-%d"),
            r["common"]["mid"],
        )
        for r in entry
    }
    got_keys = {(r.dt, r.mid) for r in got}
    assert got_keys == keys
    assert len(got) == len(keys), "exactly one row per (dt, mid)"

    # enrichment correctness: gender/age/province match the dims
    users = {u["id"]: u for u in _read_jsonl(str(fixture_dir / "dims" / "user_info"))}
    provs = {
        p["id"]: p for p in _read_jsonl(str(fixture_dir / "dims" / "base_province"))
    }
    ref = datetime.date.fromisoformat(AGE_REF)
    for r in got[:50]:
        u = users[int(r.user_id)]
        assert r.user_gender == u["gender"]
        b = datetime.date.fromisoformat(u["birthday"])
        age = ref.year - b.year - ((ref.month, ref.day) < (b.month, b.day))
        assert r.user_age == age
        assert r.province_name == provs[int(r.province_id)]["name"]
        assert r.hr == datetime.datetime.fromtimestamp(
            r.ts / 1000, tz=datetime.timezone.utc
        ).strftime("%H")


# ---------------------------------------------------------------------------
# order pipeline: stream-stream join with 24 h TTL (J4/J5)
# ---------------------------------------------------------------------------


def test_order_stream_stream_join_ttl(spark, fixture_dir):
    meta = json.loads((fixture_dir / "meta.json").read_text())
    info_schema = T.StructType(S.ORDER_INFO_SCHEMA.fields + [T.StructField("event_ts", T.LongType())])
    det_schema = T.StructType(S.ORDER_DETAIL_SCHEMA.fields + [T.StructField("event_ts", T.LongType())])

    dim_user, dim_prov = _dims(spark, fixture_dir)
    info_stream = (
        spark.readStream.schema(info_schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(fixture_dir / "orders" / "order_info"))
    )
    det_stream = (
        spark.readStream.schema(det_schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(fixture_dir / "orders" / "order_detail"))
    )
    wide = order_wide_join(
        enrich_order_info(info_stream, dim_user, dim_prov), det_stream, streaming=True
    )
    _run_stream_to_memory(wide, "order_wide_out")
    got = spark.sql("SELECT * FROM order_wide_out").collect()

    infos = {r["id"]: r for r in _read_jsonl(str(fixture_dir / "orders" / "order_info"))}
    details = _read_jsonl(str(fixture_dir / "orders" / "order_detail"))
    ttl_ms = 24 * 3600 * 1000
    expected_pairs = {
        (d["order_id"], d["id"])
        for d in details
        if d["order_id"] in infos
        and abs(d["event_ts"] - infos[d["order_id"]]["event_ts"]) <= ttl_ms
    }
    got_pairs = {(r.order_id, r.detail_id) for r in got}
    assert got_pairs == expected_pairs
    assert len(got) == len(expected_pairs), "each pair exactly once"

    # the planted >TTL details are dropped
    dropped = set(meta["ttl_dropped_detail_ids"])
    assert dropped and not {d for (_, d) in got_pairs} & dropped

    # J5 merge: detail's create_time wins; money fields from both sides
    by_pair = {(r.order_id, r.detail_id): r for r in got}
    for d in details[:80]:
        key = (d["order_id"], d["id"])
        if key not in by_pair:
            continue
        r = by_pair[key]
        assert r.create_time == d["create_time"]
        assert r.split_total_amount == d["split_total_amount"]
        assert r.total_amount == infos[d["order_id"]]["total_amount"]
        assert r.create_date == infos[d["order_id"]]["create_time"].split(" ")[0]


# ---------------------------------------------------------------------------
# CDC routing (T8/T9/K4/K6)
# ---------------------------------------------------------------------------


def test_cdc_routing_stream(spark, fixture_dir):
    path = str(fixture_dir / "raw_cdc")
    raw = spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(path)
    cdc = parse_cdc(raw)
    _run_stream_to_memory(route_facts(cdc), "cdc_facts")
    _run_stream_to_memory(route_dims(cdc), "cdc_dims")

    truth = _read_jsonl(path)

    def norm_op(t):
        if t == "bootstrap-insert":
            return "insert"
        return t if t in ("insert", "update", "delete") else None

    exp_facts = [
        (f"DWD_{r['table'].upper()}_{norm_op(r['type']).upper()}")
        for r in truth
        if norm_op(r["type"]) and r["table"] in ("order_info", "order_detail")
    ]
    exp_dims = [
        f"DIM:{r['table'].upper()}:{r['data']['id']}"
        for r in truth
        if norm_op(r["type"]) and r["table"] in ("user_info", "base_province")
    ]
    facts = spark.sql("SELECT topic FROM cdc_facts").collect()
    dims = spark.sql("SELECT key FROM cdc_dims").collect()
    assert sorted(r.topic for r in facts) == sorted(exp_facts)
    assert sorted(r.key for r in dims) == sorted(exp_dims)
    # garbage ops and unlisted tables never appear
    assert spark.sql(
        "SELECT count(*) c FROM cdc_facts WHERE topic LIKE '%GARBAGE%' OR topic LIKE '%UNLISTED%'"
    ).first().c == 0


def test_order_stream_left_outer_emits_orphans_once(spark, fixture_dir, tmp_path):
    """Beyond-reference: left-outer stream-stream join. Orphaned details
    (header missing or outside the ±24 h TTL window) emit exactly once
    with null header columns — but only after the watermark proves no
    match can still arrive, which the test forces with far-future
    sentinel rows on both inputs."""
    import shutil

    # private copy of the fixture dirs (we append flush sentinels)
    src = fixture_dir / "orders"
    work = tmp_path / "orders_outer"
    shutil.copytree(src, work)

    info_schema = T.StructType(
        S.ORDER_INFO_SCHEMA.fields + [T.StructField("event_ts", T.LongType())]
    )
    det_schema = T.StructType(
        S.ORDER_DETAIL_SCHEMA.fields + [T.StructField("event_ts", T.LongType())]
    )
    dim_user, dim_prov = _dims(spark, fixture_dir)
    info_stream = (
        spark.readStream.schema(info_schema)
        .option("maxFilesPerTrigger", 2)
        .json(str(work / "order_info"))
    )
    det_stream = (
        spark.readStream.schema(det_schema)
        .option("maxFilesPerTrigger", 2)
        .json(str(work / "order_detail"))
    )
    wide = order_wide_join(
        enrich_order_info(info_stream, dim_user, dim_prov),
        det_stream,
        streaming=True,
        how="left_outer",
    )
    q = (
        wide.writeStream.format("memory")
        .queryName("order_wide_outer")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()

    infos = {r["id"]: r for r in _read_jsonl(str(src / "order_info"))}
    details = _read_jsonl(str(src / "order_detail"))
    max_ts = max(
        [r["event_ts"] for r in infos.values()] + [d["event_ts"] for d in details]
    )

    # two rounds of far-future sentinels: the first advances the
    # watermark past every real row's TTL horizon, the second forces the
    # extra micro-batch in which Spark evicts state and emits the nulls
    for k, bump in ((1, 60), (2, 120)):
        flush_ts = max_ts + bump * 3600_000
        (work / "order_info" / f"zz_flush_{k}.json").write_text(
            json.dumps({"id": -100 - k, "user_id": 1, "province_id": 1,
                        "create_time": "2030-01-01 00:00:00", "event_ts": flush_ts})
            + "\n"
        )
        (work / "order_detail" / f"zz_flush_{k}.json").write_text(
            json.dumps({"id": -200 - k, "order_id": -999, "sku_id": 1,
                        "create_time": "2030-01-01 00:00:00", "event_ts": flush_ts})
            + "\n"
        )
        q.processAllAvailable()
    q.stop()

    got = spark.sql("SELECT * FROM order_wide_outer WHERE detail_id > 0").collect()

    ttl_ms = 24 * 3600 * 1000
    matched = {
        (d["order_id"], d["id"])
        for d in details
        if d["order_id"] in infos
        and abs(d["event_ts"] - infos[d["order_id"]]["event_ts"]) <= ttl_ms
    }
    orphan_ids = {d["id"] for d in details} - {did for (_, did) in matched}
    meta = json.loads((fixture_dir / "meta.json").read_text())
    assert set(meta["ttl_dropped_detail_ids"]) <= orphan_ids

    inner_pairs = {(r.order_id, r.detail_id) for r in got if r.order_id is not None}
    null_rows = [r for r in got if r.order_id is None]
    assert inner_pairs == matched
    assert {r.detail_id for r in null_rows} == orphan_ids
    assert len(null_rows) == len(orphan_ids), "each orphan exactly once"
    # orphan rows carry the detail columns but null header enrichment
    for r in null_rows[:10]:
        assert r.sku_name is not None and r.total_amount is None
        assert r.user_gender is None and r.province_name is None
