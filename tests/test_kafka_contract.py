"""Kafka connector contract tests (SURVEY §2.1 S1/S2, §2.2 K1-K4).

No broker ships in this container, so these freeze the option dicts
against the reference's consumer/producer configs
(`util/MyKafkaUtils.scala:38-44,88-91`) and the payload-shaping
transforms against the two `send` overloads and the dynamic
`DWD_${table}_${op}` routing. A round-trip integration test runs only
when KAFKA_BOOTSTRAP points at a live broker.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.sources.kafka import (
    SINK_DEFAULTS,
    kafka_source_options,
    with_kafka_payload,
)

BOOT = "hostA:9092,hostB:9092"


def test_source_options_default_offsets():
    """S1 (`MyKafkaUtils.scala:88-91,96-102`): latest reset, string K/V
    (implicit — Spark's kafka source is bytes, cast downstream), group id
    passthrough. enable.auto.commit intentionally ABSENT: the checkpoint
    owns offsets (S3/K7), the reference's auto-commit is replaced."""
    opts = kafka_source_options(BOOT, "ODS_BASE_LOG", "ods_base_log_group")
    assert opts["kafka.bootstrap.servers"] == BOOT
    assert opts["subscribe"] == "ODS_BASE_LOG"
    assert opts["kafka.group.id"] == "ods_base_log_group"
    assert opts["startingOffsets"] == "latest"
    assert opts["failOnDataLoss"] == "false"
    assert "kafka.enable.auto.commit" not in opts


def test_source_options_explicit_offsets_json():
    """S2 (`MyKafkaUtils.scala:107-113`): the explicit per-partition
    offset map, as the structured source's startingOffsets JSON."""
    offsets = json.dumps({"ODS_BASE_DB": {"0": 42, "1": 17}})
    opts = kafka_source_options(BOOT, "ODS_BASE_DB", "g", starting_offsets=offsets)
    assert json.loads(opts["startingOffsets"]) == {"ODS_BASE_DB": {"0": 42, "1": 17}}


def test_sink_defaults_match_reference_producer():
    """K1 producer configs (`MyKafkaUtils.scala:38-44`): acks=all,
    batch.size=16384, linger.ms=1, idempotence on."""
    assert SINK_DEFAULTS["kafka.acks"] == "all"
    assert SINK_DEFAULTS["kafka.batch.size"] == "16384"
    assert SINK_DEFAULTS["kafka.linger.ms"] == "1"
    assert SINK_DEFAULTS["kafka.enable.idempotence"] == "true"


def test_payload_value_only_k1(spark):
    df = spark.createDataFrame([("a",), ("b",)], "v string")
    out = with_kafka_payload(df, "v")
    assert out.columns == ["value"]


def test_payload_keyed_k2(spark):
    """The keyed `send(topic, key, msg)` overload (`MyKafkaUtils.scala:60`)."""
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    out = with_kafka_payload(df, "v", key_col="k")
    assert set(out.columns) == {"key", "value"}
    row = out.collect()[0]
    assert row.key == "1" and row.value == "a"  # cast to string K/V


def test_payload_static_vs_dynamic_topic_k4(spark):
    df = spark.createDataFrame([("a", "DWD_t1_I")], "v string, topic string")
    static = with_kafka_payload(df, "v", topic="FIXED")
    assert static.select("topic").distinct().collect()[0][0] == "FIXED"
    dynamic = with_kafka_payload(df, "v")
    assert dynamic.collect()[0].topic == "DWD_t1_I"  # per-row routing


@pytest.mark.skipif(
    not os.environ.get("KAFKA_BOOTSTRAP"),
    reason="no broker in this environment; set KAFKA_BOOTSTRAP to run",
)
def test_kafka_round_trip(spark, tmp_path):
    """Write a batch through the kafka sink and read it back."""
    from bigdata_spark_realtime_spark.sources.kafka import (
        read_kafka_stream,
        write_kafka_stream,
    )

    boot = os.environ["KAFKA_BOOTSTRAP"]
    topic = "bsr_contract_test"
    df = spark.readStream.format("rate").option("rowsPerSecond", "5").load()
    payload = with_kafka_payload(
        df.select(F.col("value").cast("string").alias("v")), "v"
    )
    q = (
        write_kafka_stream(payload, boot, str(tmp_path / "ckpt"), topic=topic)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        back = read_kafka_stream(spark, boot, topic, "bsr_test_group", "earliest")
        sink = back.writeStream.format("memory").queryName("kafka_back").start()
        import time

        time.sleep(10)
        assert spark.table("kafka_back").count() > 0
        sink.stop()
    finally:
        q.stop()
