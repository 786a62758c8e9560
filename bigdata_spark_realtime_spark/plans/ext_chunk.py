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
),
-- zip-unnest + chunk-membership groupBy instead of the lateral
-- range-join with t[a:b] list slicing: the slice form carries the
-- whole token list on every chunk row — quadratic in document width
-- (see plans/ext_lm.py LM_ORACLE; the wide-record boundary sweep
-- OOM-killed the old shape). Token at 0-based position i belongs to
-- chunks c with c*STRIDE <= i <= c*STRIDE + CHUNK_W - 1, i.e. at most
-- ceil(CHUNK_W / STRIDE) chunks; chunk count, text, and token count
-- fall out of the membership group. Verified element-exact against
-- the slice form on boundary-rich lengths (0/1/23..49/100/257).
tok AS (
  SELECT doc_id, unnest(t) AS w, unnest(range(len(t))) AS i FROM toks
),
cand AS (
  SELECT doc_id, w, i,
         unnest(range(greatest((i - {CHUNK_W} + {STRIDE}) // {STRIDE}, 0),
                      i // {STRIDE} + 1)) AS c
  FROM tok
)
SELECT doc_id,
       CAST(c AS INT) AS chunk_id,
       string_agg(w, ' ' ORDER BY i) AS chunk_text,
       CAST(count(*) AS BIGINT) AS n_chunk_tokens
FROM cand
GROUP BY doc_id, c
"""


@register("ext_chunk_windows", oracle=CHUNK_ORACLE)
def ext_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunks per document: (doc_id, chunk_id,
    chunk_text, n_chunk_tokens), map-side only."""
    docs = load_table(spark, sf_dir, "documents")
    # materialize the token array below the transform: an inline split
    # referenced by slice/size inside the interpreted lambda would be
    # re-evaluated per chunk element — O(width²) per document (see
    # ext_text.ext_text_fingerprint; wide-record boundary sweep catch)
    docs = docs.select("doc_id", F.split("text", " ", -1).alias("toks"))
    t = F.col("toks")
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
