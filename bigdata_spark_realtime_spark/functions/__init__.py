"""Column-function library (reference scalar fns F1-F11 + extensions)."""

from bigdata_spark_realtime_spark.functions.scalar import (  # noqa: F401
    age_bucket,
    age_years,
    dt_col,
    gender_decode,
    highlight,
    hr_col,
    match_all_tokens,
)
