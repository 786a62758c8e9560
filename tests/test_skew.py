"""Salted join produces exactly the plain join's result."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # pathological skew: 90% of left rows share one key
    left = spark.range(2000).select(
        F.when(F.col("id") % 10 != 0, 7).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame(
        [(7, "hot"), (0, "zero"), (10, "ten"), (999999, "miss")], "k long, name string"
    )
    plain = left.join(right, "k").select("k", "v", "name")
    salted = salted_join(left, right, left["k"], right["k"], n_salt=8).select(
        left["k"].alias("k"), "v", "name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    right = spark.createDataFrame([(1, "x")], "k long, name string")
    out = salted_join(left, right, left["k"], right["k"], n_salt=4, how="left").select(
        left["k"].alias("k"), "v", "name"
    )
    assert sorted(map(tuple, out.collect())) == [(1, "a", "x"), (2, "b", None)]
