"""Approximate aggregates stay within their error bounds vs exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.olap_extras import approx_aggregates
from bigdata_spark_realtime_spark.sources.tables import load_table


def test_approx_within_bounds(spark, sf_dir):
    approx = {r.event_type: r for r in approx_aggregates(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("median"),
        )
        .collect()
    }
    assert approx.keys() == exact.keys()
    for t in exact:
        assert abs(approx[t].approx_users - exact[t].users) <= max(
            2, 0.05 * exact[t].users
        ), t
        spread = ev.agg(F.max("value") - F.min("value")).first()[0]
        assert abs(approx[t].approx_median_value - exact[t].median) <= 0.05 * spread, t
