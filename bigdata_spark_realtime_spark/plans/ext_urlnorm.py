"""URL-canonicalization dedup — the one standard corpus-pipeline dedup
axis the registry had not yet covered (round-14 judge brief #8): crawl
corpora carry the same logical page under many raw URL spellings
(scheme/host case, ``www.`` prefix, default ports, tracking query
params, duplicate slashes, fragments, trailing slashes), and URL-level
dedup is the cheapest pass in a crawl pipeline — it runs before any
content fingerprint because it needs no document bytes at all.

The driver testdata has no URL column, so — exactly like the
multimodal family synthesizes payloads (``plans/ext_multimodal.py``) —
the operator derives a deterministic raw URL per document and the
DuckDB oracle derives the identical string: four spelling variants
(``doc_id % 4``) of one logical page per ``doc_id div 4`` group, with
a legitimate ``page=2`` query param on every third page (it must
SURVIVE canonicalization while ``utm_*``/``gclid`` params are
stripped). Host labels are md5-hex of the page id — never document
text — so the canonicalizer's ``lower()`` only ever touches ASCII and
the adversarial-unicode boundary mode cannot drive a Java-vs-ICU
case-folding divergence (the round-14 ``ext_multimodal_frames``
lesson applied up front).

Canonicalization chain (all codegen string ops, no UDF):
scheme+host lowercased, ``www.`` stripped, default port dropped
(``:443`` https / ``:80`` http), fragment stripped, tracking params
(``utm_*``, ``gclid``, ``fbclid``) removed with separator repair,
duplicate path slashes collapsed, trailing slash dropped.

Scale (100 TB): canonicalization is pure map-side whole-stage-codegen
string work on the URL column only (no document bytes); the dedup is
ONE shuffle on ``canonical_url`` with map-side partial ``count``/
``min`` combiners, the same single-exchange shape as
``ext_dedup_exact``. A hot canonical URL (the real-world skew case)
still combines map-side, so the reducer sees one partial row per map
partition, not the raw duplicate stream.

Reference parity: extends the dedup family of `SURVEY.md §2.12`;
the reference engine itself has no URL axis (its keys are numeric
ids, `app/dwd_OrderApp.scala`), so this is extension surface like the
rest of the ext_dedup family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: variants per logical page (doc_id div VARIANTS collapses to one page)
VARIANTS = 4


def _raw_url(self_df: DataFrame) -> Column:
    """Deterministic raw-URL spelling for each document row; the DuckDB
    oracle builds the byte-identical string (URL_CTE below)."""
    pid = F.expr(f"doc_id div {VARIANTS}").cast("string")
    host = F.substring(F.md5(pid), 1, 8)
    v = F.col("doc_id") % VARIANTS
    legit = F.when(
        F.expr(f"(doc_id div {VARIANTS}) % 3 = 0"), F.lit("?page=2")
    ).otherwise(F.lit(""))
    path = F.concat(F.lit("/articles/"), pid)
    clean = F.concat(F.lit("https://"), host, F.lit(".example.com"), path)
    return (
        F.when(v == 0, F.concat(clean, legit))
        .when(
            v == 1,
            F.concat(
                F.lit("HTTPS://WWW."),
                F.upper(host),
                F.lit(".EXAMPLE.COM:443"),
                path,
                F.lit("/"),
                legit,
            ),
        )
        .when(
            v == 2,
            F.concat(
                clean,
                F.when(
                    legit == "", F.lit("?")
                ).otherwise(F.concat(legit, F.lit("&"))),
                F.lit("utm_source=feed&utm_campaign=c"),
                (F.col("doc_id") % 5).cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://www."),
                host,
                F.lit(".example.com/"),
                path,
                legit,
                F.lit("#sec-"),
                (F.col("doc_id") % 7).cast("string"),
            )
        )
    )


def canonical_url(url: Column) -> Column:
    """Canonicalize a raw URL with codegen-only string ops. Regexes are
    kept inside the RE2 subset (no lookaround, no backrefs in patterns)
    so the DuckDB oracle can run the same automaton."""
    head = F.lower(
        F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    )
    tail = F.substr(url, F.length(head) + F.lit(1))
    head = F.regexp_replace(head, r"^([a-z][a-z0-9+.-]*://)www\.", "$1")
    head = F.regexp_replace(head, r"^(https://[^/:]+):443$", "$1")
    head = F.regexp_replace(head, r"^(http://[^/:]+):80$", "$1")
    tail = F.regexp_replace(tail, r"#.*", "")
    tail = F.regexp_replace(tail, r"(utm_[a-z]+|gclid|fbclid)=[^&]*", "")
    tail = F.regexp_replace(tail, r"&+", "&")
    tail = F.regexp_replace(tail, r"\?&", "?")
    tail = F.regexp_replace(tail, r"[?&]+$", "")
    tail = F.regexp_replace(tail, r"/{2,}", "/")
    tail = F.regexp_replace(tail, r"/\?", "?")
    tail = F.regexp_replace(tail, r"/$", "")
    return F.concat(head, tail)


#: the same generation + canonicalization in DuckDB SQL. Replacement
#: backrefs differ by dialect (Spark ``$1`` vs DuckDB ``\1``) and
#: DuckDB's regexp_replace is first-match-only without the 'g' option;
#: semantics are byte-identical, enforced by the three-sf sweep and
#: the boundary modes.
URL_ORACLE = f"""
WITH gen AS (
  SELECT doc_id,
         substring(md5(CAST(doc_id // {VARIANTS} AS STRING)), 1, 8) AS host,
         CAST(doc_id // {VARIANTS} AS STRING) AS pid,
         doc_id % {VARIANTS} AS v,
         CASE WHEN (doc_id // {VARIANTS}) % 3 = 0 THEN '?page=2' ELSE '' END AS legit
  FROM documents
),
raw AS (
  SELECT doc_id,
         CASE v
           WHEN 0 THEN 'https://' || host || '.example.com/articles/' || pid || legit
           WHEN 1 THEN 'HTTPS://WWW.' || upper(host) || '.EXAMPLE.COM:443/articles/'
                       || pid || '/' || legit
           WHEN 2 THEN 'https://' || host || '.example.com/articles/' || pid
                       || CASE WHEN legit = '' THEN '?' ELSE legit || '&' END
                       || 'utm_source=feed&utm_campaign=c' || CAST(doc_id % 5 AS STRING)
           ELSE 'https://www.' || host || '.example.com//articles/' || pid || legit
                || '#sec-' || CAST(doc_id % 7 AS STRING)
         END AS raw_url
  FROM gen
),
split AS (
  SELECT doc_id, raw_url,
         lower(regexp_extract(raw_url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0)) AS head0,
         substring(raw_url,
                   length(regexp_extract(raw_url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0)) + 1
         ) AS tail0
  FROM raw
),
canon AS (
  SELECT doc_id, raw_url,
         regexp_replace(
           regexp_replace(
             regexp_replace(head0, '^([a-z][a-z0-9+.-]*://)www\\.', '\\1'),
             '^(https://[^/:]+):443$', '\\1'),
           '^(http://[^/:]+):80$', '\\1')
         ||
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(tail0, '#.*', '', 'g'),
                       '(utm_[a-z]+|gclid|fbclid)=[^&]*', '', 'g'),
                     '&+', '&', 'g'),
                   '\\?&', '?', 'g'),
                 '[?&]+$', '', 'g'),
               '/{{2,}}', '/', 'g'),
             '/\\?', '?', 'g'),
           '/$', '', 'g')
         AS canonical_url
  FROM split
)
SELECT canonical_url,
       count(*) AS n_docs,
       count(DISTINCT raw_url) AS n_raw_variants,
       min(doc_id) AS keeper_doc_id
FROM canon
GROUP BY canonical_url
"""


@register("ext_dedup_url", oracle=URL_ORACLE)
def ext_dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup: derive each document's raw URL
    spelling, canonicalize with the codegen chain, group on the
    canonical key — one shuffle, map-side combiners, keeper = min
    doc_id (the first-crawled page wins, the usual crawl rule)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    urls = docs.select(
        "doc_id", _raw_url(docs).alias("raw_url")
    ).withColumn("canonical_url", canonical_url(F.col("raw_url")))
    return urls.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("raw_url").alias("n_raw_variants"),
        F.min("doc_id").alias("keeper_doc_id"),
    )
