"""Document chunking for embedding / retrieval pipelines.

Long documents are split into fixed-size token windows with overlap —
the standard preparation step before embedding (RAG indexing) or
fixed-context training when document boundaries must be preserved
(contrast ext_pack_shards, which concatenates docs into budgeted
shards). The reference has no text-window operator; this extends the
training-data suite.

Chunk layout: starts at 0, STRIDE, 2·STRIDE, … while start < n_tokens;
each chunk takes up to CHUNK_W tokens, so consecutive chunks overlap by
CHUNK_W − STRIDE tokens and the final chunk may be short. Every token
belongs to ≥1 chunk; nothing is dropped.

Scale (100 TB): the operator is a pure map-side explode — ZERO
exchanges (pinned by plan hygiene) — so it composes with any upstream
partitioning and parallelizes with the scan. Chunk construction is
array slicing over the already-split token array (a handful of
``slice`` calls per doc, not per-token expression work — unlike the
per-element transform/element_at shingle pathology, chunk counts are
~n/STRIDE per doc, so JVM expressions are the fast path here and no
Python crosses the boundary)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: tokens per chunk
CHUNK_W = 32
#: stride between chunk starts (overlap = CHUNK_W - STRIDE)
STRIDE = 24

CHUNK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
)
SELECT doc_id,
       CAST(i AS INT) AS chunk_id,
       array_to_string(t[i * {STRIDE} + 1 : i * {STRIDE} + {CHUNK_W}], ' ')
         AS chunk_text,
       CAST(least({CHUNK_W}, len(t) - i * {STRIDE}) AS BIGINT)
         AS n_chunk_tokens
FROM toks, unnest(range((len(t) + {STRIDE} - 1) // {STRIDE})) AS u(i)
"""


@register("ext_chunk_windows", oracle=CHUNK_ORACLE)
def ext_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunks per document: (doc_id, chunk_id,
    chunk_text, n_chunk_tokens), map-side only."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ", -1)
    chunk = F.transform(
        F.sequence(
            F.lit(0), F.floor((F.size(t) + STRIDE - 1) / STRIDE).cast("int") - 1
        ),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.array_join(F.slice(t, i * STRIDE + 1, CHUNK_W), " ").alias(
                "chunk_text"
            ),
            F.least(
                F.lit(CHUNK_W), F.size(t) - i * STRIDE
            ).cast("long").alias("n_chunk_tokens"),
        ),
    )
    return (
        docs.select("doc_id", F.explode(chunk).alias("c"))
        .select("doc_id", "c.chunk_id", "c.chunk_text", "c.n_chunk_tokens")
    )
