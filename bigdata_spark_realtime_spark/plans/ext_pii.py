"""Extension operator: PII detection and redaction.

Every public web-scale training corpus ships a PII scrub (C4 removed
lines with curse-word lists and pattern hits; Dolma/ROOTS redact
emails, IPs and phone numbers with regexes — arXiv:2402.00159 §4.1).
This module implements that stage as pure codegen string ops —
``regexp_extract_all`` for counts, chained ``regexp_replace`` for the
rewrite — no UDFs, fully pushdown-friendly, trivially map-side at
100 TB (zero shuffles; plan-hygiene pins it).

The synthetic corpus contains no organic PII, which would make an
oracle over raw ``documents`` an empty identity check. Instead the
query INJECTS deterministic PII derived from ``doc_id`` into each
text (same expression in Spark and the SQL oracle) and then redacts
it, so the driver's hash gate verifies the full match+replace
semantics character-for-character across engines. The regex subset
used (char classes, bounded repetition, ``\\b``, ``\\d``) behaves
identically in Java regex (Spark) and RE2 (DuckDB).

Order matters and is part of the contract: emails are redacted before
IPs before phones, in one documented chain, so a string that could
match two patterns resolves the same way on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: the scrub patterns — shared between the Spark plan, the SQL oracle
#: and the unit tests. Keep each inside the Java∩RE2 common subset.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

#: redaction tokens (Dolma-style typed placeholders)
EMAIL_TOKEN = "|||EMAIL|||"
IP_TOKEN = "|||IP|||"
PHONE_TOKEN = "|||PHONE|||"


def redact_pii(col: Column) -> Column:
    """Chained typed redaction: emails, then IPv4s, then phone numbers.
    Pure codegen — composes with any upstream operator map-side."""
    out = F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_RE, IP_TOKEN)
    return F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)


def pii_counts(col: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_ips, n_phones) match counts for ``col``."""
    return (
        F.size(F.regexp_extract_all(col, F.lit(EMAIL_RE), F.lit(0))).cast("int"),
        F.size(F.regexp_extract_all(col, F.lit(IPV4_RE), F.lit(0))).cast("int"),
        F.size(F.regexp_extract_all(col, F.lit(PHONE_RE), F.lit(0))).cast("int"),
    )


def _sql_escape(pat: str) -> str:
    # DuckDB string literals are standard SQL: backslash is literal,
    # only single quotes need doubling
    return pat.replace("'", "''")


# deterministic injected PII: one email, one IP, one phone per doc,
# all derived from doc_id with the SAME integer arithmetic both sides
_INJECT = (
    "text || ' contact user' || doc_id::VARCHAR || '@example.com at 10.'"
    " || (doc_id % 200)::VARCHAR || '.0.' || (doc_id % 250)::VARCHAR"
    " || ' or 555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-'"
    " || lpad((doc_id % 10000)::VARCHAR, 4, '0')"
)

_E, _I, _P = _sql_escape(EMAIL_RE), _sql_escape(IPV4_RE), _sql_escape(PHONE_RE)

PII_ORACLE = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(enriched, '{_E}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(enriched, '{_I}')) AS INT) AS n_ips,
       CAST(len(regexp_extract_all(enriched, '{_P}')) AS INT) AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(
             enriched, '{_E}', '{EMAIL_TOKEN}', 'g'),
             '{_I}', '{IP_TOKEN}', 'g'),
             '{_P}', '{PHONE_TOKEN}', 'g')) AS redacted_md5
FROM (SELECT doc_id, {_INJECT} AS enriched FROM documents)
"""


@register("ext_pii_redact", oracle=PII_ORACLE)
def ext_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc PII counts + md5 of the redacted text over the
    PII-enriched corpus — verifies match and replacement semantics
    end-to-end in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    enriched = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        did.cast("string"),
        F.lit("@example.com at 10."),
        (did % 200).cast("string"),
        F.lit(".0."),
        (did % 250).cast("string"),
        F.lit(" or 555-"),
        F.lpad((did % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
    )
    n_em, n_ip, n_ph = pii_counts(enriched)
    return docs.select(
        "doc_id",
        n_em.alias("n_emails"),
        n_ip.alias("n_ips"),
        n_ph.alias("n_phones"),
        F.md5(redact_pii(enriched)).alias("redacted_md5"),
    )
