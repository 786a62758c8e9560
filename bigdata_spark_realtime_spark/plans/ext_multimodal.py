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
