"""Serving layer: the reference's REST query surface as a Python API."""

from bigdata_spark_realtime_spark.serving.api import ServingAPI  # noqa: F401
