"""Windowed aggregation — beyond the reference surface (SURVEY.md §2.9 W6:
the reference has *no* windows; hourly stats are derived-column groupings).

The engine supports real event-time windows — the Structured Streaming
native form of time bucketing — shown here in its batch guise (identical
expression streams with a watermark; both engines align tumbling windows
to the epoch, verified).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

W6_ORACLE = """
SELECT strftime(time_bucket(INTERVAL 6 HOURS, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS ct,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
"""


@register("w6_tumbling_window_agg", oracle=W6_ORACLE)
def w6_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-hour tumbling windows × event_type: counts + sums. In streaming
    this same expression runs with `withWatermark(ts, ...)` ahead of the
    groupBy; window state evicts as the watermark passes each bucket."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("ct"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "ct",
            "total_value",
        )
    )
