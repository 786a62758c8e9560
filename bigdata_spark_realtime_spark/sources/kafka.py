"""Kafka connectors — SURVEY.md §2.1 S1/S2 + §2.2 K1-K4.

The reference wraps kafka-clients in MyKafkaUtils (consumer:
`util/MyKafkaUtils.scala:77-113`; idempotent producer `:27-61`). The
Spark twin is option-building for the built-in `kafka` source/sink —
offset tracking, flush barriers, and the producer pool all disappear
into checkpointing and the sink commit protocol (K3/K7/S3 are
zero-code here by design).

This container ships no Kafka broker or spark-sql-kafka jar, so these
builders are exercised by unit tests on the option dicts and the
transform helpers; on a real cluster they are the production path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

#: consumer defaults mirroring the reference (`util/MyKafkaUtils.scala:77-92`):
#: string K/V (Spark's kafka source is always bytes→cast), latest reset.
#: enable.auto.commit disappears — the checkpoint owns offsets (S3/K7).
SOURCE_DEFAULTS = {
    "startingOffsets": "latest",
    "failOnDataLoss": "false",
}

#: producer defaults mirroring `util/MyKafkaUtils.scala:36-44`:
#: acks=all + idempotence; batching is handled by the sink.
SINK_DEFAULTS = {
    "kafka.acks": "all",
    "kafka.enable.idempotence": "true",
    "kafka.batch.size": "16384",
    "kafka.linger.ms": "1",
}


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    group_id: str,
    starting_offsets: str | None = None,
) -> dict[str, str]:
    """S1 (default offsets) / S2 (explicit offsets: pass a JSON offset map
    as ``starting_offsets`` — superseded in practice by the checkpoint)."""
    opts = dict(SOURCE_DEFAULTS)
    opts.update(
        {
            "kafka.bootstrap.servers": bootstrap_servers,
            "subscribe": topic,
            "kafka.group.id": group_id,
        }
    )
    if starting_offsets is not None:
        opts["startingOffsets"] = starting_offsets
    return opts


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    group_id: str,
    starting_offsets: str | None = None,
) -> DataFrame:
    """S1/S2: subscribe → DataFrame with string key/value (the reference's
    StringDeserializer pair)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(
        bootstrap_servers, topic, group_id, starting_offsets
    ).items():
        reader = reader.option(k, v)
    return reader.load().select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    )


def with_kafka_payload(
    df: DataFrame, value_col: str, key_col: str | None = None, topic: str | None = None
) -> DataFrame:
    """Shape a DataFrame for the Kafka sink.

    K1: value only (sticky partitioner). K2: key column → key-hash
    partitioning. K4: per-row dynamic routing — if the input has a
    `topic` column (and ``topic`` arg is None) the sink routes each row
    to its own topic, exactly replacing the reference's per-record
    `send(s"DWD_${table}_${op}", ...)`.
    """
    cols = [F.col(value_col).cast("string").alias("value")]
    if key_col is not None:
        cols.append(F.col(key_col).cast("string").alias("key"))
    if topic is not None:
        cols.append(F.lit(topic).alias("topic"))
    elif "topic" in df.columns:
        cols.append(F.col("topic"))
    return df.select(*cols)


def write_kafka_stream(
    df: DataFrame,
    bootstrap_servers: str,
    checkpoint_location: str,
    topic: str | None = None,
) -> DataStreamWriter:
    """K1-K4 sink: exactly-once-to-topic via checkpoint + idempotent
    producer (the reference's manual flush-then-commit barrier K3/K7 is
    the sink's native commit protocol)."""
    writer = (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint_location)
    )
    for k, v in SINK_DEFAULTS.items():
        writer = writer.option(k, v)
    if topic is not None:
        writer = writer.option("topic", topic)
    return writer
