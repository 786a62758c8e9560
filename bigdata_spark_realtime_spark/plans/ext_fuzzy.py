"""Fuzzy (edit-distance) similarity join over the part-name vocabulary.

Entity resolution's other half: the dedup family matches *documents*
by shingle/embedding similarity, but catalog/master-data cleanup needs
*short-string* matching — "did two near-identical names slip into the
part catalog?". The classic recipe is a blocked Levenshtein join:
block candidates on a cheap equality key so the quadratic comparison
only runs inside small blocks, prefilter with the length lower bound
(|len(a) − len(b)| ≤ k implies nothing, but lev ≥ |len diff| lets the
band cut pairs before the DP), then verify with exact edit distance.

Scale (100 TB): the join runs on the DISTINCT name vocabulary, not on
rows — one map-side-combined groupBy reduces any number of part rows
to the (name, n_parts) table, which is bounded by the catalog's
naming scheme, not by data volume. The equi-join key is COMPOSITE:
(last token, ⌊len/(k+1)⌋ length band). The band is implied by the
±k length predicate (|len_a − len_b| ≤ k ⇒ adjacent-or-equal bands of
width k+1), so promoting it into the key changes the plan, not the
result: one side joins on its exact band, the other explodes to
{band−1, band, band+1} (each band value distinct, so no pair
duplicates), and a degenerate naming scheme that collapses the token
key — every name ending "pro" — still splits its block by length
band instead of going quadratic on the whole vocabulary.
`levenshtein` is a JVM built-in on both engines (identical classic
DP), so the verify stage is whole-stage-codegen, no Python.

Reference parity: the reference's ES `match` queries do analyzer-level
fuzzy lookups (`ia/PublisherMapperImpl.java:74-76`); this is the
batch/offline twin of that capability, exact and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: maximum edit distance for a match (verify stage)
FUZZY_MAX_DIST = 2

FUZZY_ORACLE = f"""
WITH names AS (
  SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n_parts
  FROM part GROUP BY p_name
),
keyed AS (
  SELECT name, n_parts,
         string_split(name, ' ')[-1] AS blk,
         length(name) AS len
  FROM names
)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM keyed a JOIN keyed b
  ON a.blk = b.blk
 AND a.name < b.name
 AND abs(a.len - b.len) <= {FUZZY_MAX_DIST}
WHERE levenshtein(a.name, b.name) <= {FUZZY_MAX_DIST}
"""


@register("ext_fuzzy_join_editdist", oracle=FUZZY_ORACLE)
def ext_fuzzy_join_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked Levenshtein self-join on distinct part names: equi-join
    key = (last name token, ⌊len/(k+1)⌋ band) with a 3-way band
    explosion on the right side, prefilter = ±{FUZZY_MAX_DIST} length
    band (the edit-distance lower bound, which is also what makes the
    band key result-neutral), verify = exact `levenshtein ≤
    {FUZZY_MAX_DIST}` — all on the vocabulary-sized distinct-name
    frame, never on raw part rows."""
    band_w = FUZZY_MAX_DIST + 1
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("name"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
        .select(
            "name",
            "n_parts",
            F.element_at(F.split("name", " ", -1), -1).alias("blk"),
            F.length("name").alias("len"),
        )
        .withColumn("band", F.expr(f"len DIV {band_w}"))
    )
    a = names.select(
        F.col("name").alias("name_a"),
        F.col("n_parts").alias("n_parts_a"),
        F.col("blk"),
        F.col("band"),
        F.col("len").alias("len_a"),
    )
    # |len_a - len_b| <= k bounds |band_a - band_b| <= 1, so exploding
    # ONE side to its band neighborhood keeps every qualifying pair
    # reachable through the composite equi-key, exactly once
    b = names.select(
        F.col("name").alias("name_b"),
        F.col("n_parts").alias("n_parts_b"),
        F.col("blk").alias("blk_b"),
        F.explode(
            F.array(
                F.col("band") - 1, F.col("band"), F.col("band") + 1
            )
        ).alias("band_b"),
        F.col("len").alias("len_b"),
    )
    return (
        a.join(
            b,
            (F.col("blk") == F.col("blk_b"))
            & (F.col("band") == F.col("band_b"))
            & (F.col("name_a") < F.col("name_b"))
            & (
                F.abs(F.col("len_a") - F.col("len_b")) <= FUZZY_MAX_DIST
            ),
        )
        .where(F.levenshtein("name_a", "name_b") <= FUZZY_MAX_DIST)
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("bigint").alias("dist"),
            "n_parts_a",
            "n_parts_b",
        )
    )
