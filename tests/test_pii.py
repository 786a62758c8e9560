"""PII scrub semantics on handcrafted text (the synthetic corpus has
no organic PII, so the operator's edge behavior is pinned here against
a Python ``re`` reference implementing the same chain)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.ext_pii import (
    EMAIL_RE,
    EMAIL_TOKEN,
    IP_TOKEN,
    IPV4_RE,
    PHONE_RE,
    PHONE_TOKEN,
    pii_counts,
    redact_pii,
)

CASES = [
    "mail me at jane.doe+spam@mail.example.org today",
    "bare host a@b and @example.com match nothing",
    "minimal a@b.co works",
    "server at 10.0.0.1 and 192.168.255.254, but 1.2.3.4567 is a version",
    "call 555-123-4567 or 555-000-9999; 1555-123-4567 has no boundary",
    "combo: root@10.0.0.5.example.com then 172.16.0.9 then 555-111-2222",
    "",
]


def _py_redact(s: str) -> tuple[str, int, int, int]:
    # contract: ALL counts are matches against the ORIGINAL text (an
    # IP inside an email counts as both — detection is per-pattern),
    # while redaction chains email→ip→phone over the rewritten string
    n_e = len(re.findall(EMAIL_RE, s))
    n_i = len(re.findall(IPV4_RE, s))
    n_p = len(re.findall(PHONE_RE, s))
    s = re.sub(EMAIL_RE, EMAIL_TOKEN.replace("\\", "\\\\"), s)
    s = re.sub(IPV4_RE, IP_TOKEN.replace("\\", "\\\\"), s)
    s = re.sub(PHONE_RE, PHONE_TOKEN.replace("\\", "\\\\"), s)
    return s, n_e, n_i, n_p


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)], "i long, s string")
    n_e, n_i, n_p = pii_counts(F.col("s"))
    rows = df.select(
        "i",
        "s",
        redact_pii(F.col("s")).alias("red"),
        n_e.alias("n_e"),
        n_i.alias("n_i"),
        n_p.alias("n_p"),
    ).collect()
    return {r.i: r for r in rows}


@pytest.mark.parametrize("i", range(len(CASES)))
def test_matches_python_reference(scrubbed, i):
    # counts come from the ORIGINAL string (pii_counts is applied
    # pre-redaction in the operator), redaction chain is email→ip→phone
    want_red, want_e, want_i, want_p = _py_redact(CASES[i])
    r = scrubbed[i]
    assert (r.n_e, r.n_i, r.n_p) == (want_e, want_i, want_p), CASES[i]
    assert r.red == want_red, CASES[i]


def test_boundaries_pinned(scrubbed):
    # digits glued to a candidate kill the \b match on both engines
    assert scrubbed[3].n_i == 2 and "1.2.3.4567" in scrubbed[3].red
    assert scrubbed[4].n_p == 2 and "1555-123-4567" in scrubbed[4].red
    # '@example.com' alone is not an email; 'a@b' lacks a TLD
    assert scrubbed[1].n_e == 0
