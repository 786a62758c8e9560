"""Skew-aware join strategies for 100 TB workloads.

The reference never handled skew (`local[3]`, SURVEY.md §2.9 W8). At
cluster scale a hot join key (one mid / one order id with millions of
rows) turns one shuffle partition into the whole job's critical path.
Two remedies, composable:

1. AQE skew-join splitting — enabled by default in session.py
   (`spark.sql.adaptive.skewJoin.enabled`), handles moderate skew with
   zero code.
2. Explicit salting (below) for the pathological case where one key
   dominates: spread the hot side across N salts, replicate the build
   side N×. Result is identical to the plain join; only the physical
   distribution changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    skewed_key: str | Column,
    other_key: str | Column,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s key distribution is pathological.

    The skewed side gets a uniform salt in [0, n_salt); the other side is
    replicated across all salts (explode of a literal range — cheap when
    the other side is the smaller one). The join key becomes
    (key, salt), splitting each hot key's rows across n_salt partitions.
    The salt never leaks into the result.
    """
    skewed_key = F.col(skewed_key) if isinstance(skewed_key, str) else skewed_key
    other_key = F.col(other_key) if isinstance(other_key, str) else other_key

    left = skewed.withColumn("__salt", (F.rand(seed=42) * n_salt).cast("int"))
    right = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    joined = left.join(
        right,
        (skewed_key == other_key) & (left["__salt"] == right["__salt"]),
        how,
    )
    return joined.drop("__salt")
