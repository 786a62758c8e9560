"""Extension operators: multimodal binary-column processing (oracle-checked
slice).

`ext_multimodal_meta` proves the Arrow binary plumbing end-to-end with an
exact oracle: utf-8 payload bytes → mapInPandas metadata extraction →
byte count + md5 checksum, which DuckDB reproduces with
octet_length/md5 over the same bytes. The decode stubs themselves are
exercised by unit tests (no oracle — they're deterministic fakes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdata_spark_realtime_spark.operators.multimodal import (
    documents_as_media,
    extract_media_meta,
)
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

META_ORACLE = """
SELECT doc_id AS media_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS checksum
FROM documents
"""


@register("ext_multimodal_meta", oracle=META_ORACLE)
def ext_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    meta = extract_media_meta(documents_as_media(docs))
    return meta.select("media_id", "n_bytes", "checksum")


@register("ext_multimodal_features")
def ext_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary payload → fixed-dim float feature vector (stub encoder) →
    the same blocked-cosine near-dup operator the embeddings path uses.
    Rows-only in the gate (the encoder is a deterministic fake; the
    byte-level fold isn't SQL-expressible) — vector properties and the
    ANN-contract handoff are asserted in tests/test_multimodal.py."""
    from pyspark.sql import functions as F

    from bigdata_spark_realtime_spark.operators.multimodal import extract_features

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(documents_as_media(docs))
    return feats.select(
        "media_id",
        F.size("features").alias("dim"),
        F.round(
            F.aggregate(
                "features", F.lit(0.0), lambda acc, x: acc + x * x
            ),
            2,
        ).alias("sq_norm"),
    )
