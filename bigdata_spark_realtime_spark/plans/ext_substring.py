"""Exact duplicated-span detection over the `documents` table.

Lee et al., "Deduplicating Training Data Makes Language Models Better"
(2022) removes *substrings* (≥50-token spans) that occur verbatim in
more than one document — catching boilerplate, licenses and templated
text that document-level dedup (ext_dedup.py) misses because the
surrounding documents differ. Their single-node tool builds a suffix
array (a global sort of every suffix); the Spark-native equivalent is
fixed-width span hashing: a span duplicated across docs contains a
duplicated W-token window, so counting window hashes finds every
offending doc with two corpus passes and no global sort.

Per document: the number of W-token window positions whose window also
occurs in ≥1 *other* document, and how many distinct such windows.
Docs shorter than W tokens trivially have no spans (reported as 0).

Scale (100 TB):
- pass 1 shuffles only the 8-byte window hash (not the window text)
  to count occurrences — map-side partial aggregation applies;
- the duplicated-hash set is usually corpus-small; the pass-2 join
  back to (doc, window) rows is broadcast-eligible and AQE picks the
  strategy from runtime stats (plans/hints.py policy);
- output is one aggregation row per doc — no sort, no driver loop.
- the width W trades recall for cost exactly as in the paper: any
  duplicated span of length ≥ W is guaranteed to be hit (it contains
  a full window); spans shorter than W are missed by design.

Windows are hashed with the shared md5-derived h32 (functions/
hashing.py) so the DuckDB oracle derives identical hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.functions import hashing as H
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: duplicated-span detection width, in tokens (the paper uses 50-token
#: spans on BPE tokens; the synthetic docs are shorter, so 8 keeps the
#: operator meaningfully exercised at test SFs)
SPAN_W = 8

_GRAMS_SQL = f"""
grams AS (
  SELECT doc_id,
         {H.h32_sql('g')} AS h
  FROM (
    SELECT doc_id, unnest({H.shingles_sql('t', SPAN_W)}) AS g
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    WHERE len(t) >= {SPAN_W}
  )
),
dup AS (
  SELECT h FROM grams GROUP BY h HAVING count(DISTINCT doc_id) >= 2
)
"""

SUBSTRING_ORACLE = f"""
WITH {_GRAMS_SQL}
SELECT d.doc_id,
       COALESCE(s.n_dup_spans, 0) AS n_dup_spans,
       COALESCE(s.n_dup_windows, 0) AS n_dup_windows
FROM documents d
LEFT JOIN (
  SELECT g.doc_id,
         count(*) AS n_dup_spans,
         count(DISTINCT g.h) AS n_dup_windows
  FROM grams g JOIN dup USING (h)
  GROUP BY g.doc_id
) s ON d.doc_id = s.doc_id
"""


def _window_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, h) — one row per W-token window position, hashed
    map-side by the shared Arrow shingle kernel (operators/shingling.py:
    the JVM transform/element_at shingle expression measured ~30×
    slower and is the reason the whole dedup family moved map-side)."""
    from bigdata_spark_realtime_spark.operators.shingling import window_hash_rows

    return window_hash_rows(
        docs,
        SPAN_W,
        min_parallelism=docs.sparkSession.sparkContext.defaultParallelism,
    )


@register("ext_dedup_substring", oracle=SUBSTRING_ORACLE)
def ext_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-span stats: count of W-token window positions
    (and distinct windows) whose window text occurs verbatim in at
    least one other document."""
    docs = load_table(spark, sf_dir, "documents")
    # two consumers (the dup-hash count and the per-doc join-back); the
    # cached frame is 2 int64s per window position — cheaper at any
    # scale than re-running the Arrow hash kernel per consumer (same
    # policy as the SimHash fingerprint persist, plans/ext_dedup.py).
    # scoped_persist evicts the previous invocation's entry (round-7
    # ADVICE: plan-builder persists were never released)
    from bigdata_spark_realtime_spark.plans.corpus import scoped_persist

    grams = scoped_persist(_window_hashes(docs), "ext_dedup_substring", keep=1)
    # "h occurs in ≥2 distinct docs" ⇔ min(doc_id) ≠ max(doc_id): two
    # plain int64 min/max states with full map-side partials instead of
    # a distinct aggregate's two-phase (h, doc_id) expansion (r15
    # optimization round, guide §2.3 — aggregate before you shuffle)
    dup = (
        grams.groupBy("h")
        .agg(F.min("doc_id").alias("d0"), F.max("doc_id").alias("d1"))
        .where(F.col("d0") != F.col("d1"))
        .select("h")
    )
    per_doc = (
        grams.join(dup, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_dup_spans"),
            F.count_distinct("h").alias("n_dup_windows"),
        )
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
        F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
    )
