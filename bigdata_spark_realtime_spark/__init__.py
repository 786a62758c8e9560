"""bigdata_spark_realtime_spark — a PySpark-native analytics engine.

A brand-new engine with the query / data-processing capabilities of the
reference repo DDWe11/Bigdata_Spark_Realtime (a Spark-DStream + Kafka +
Redis + Elasticsearch real-time layered warehouse; see SURVEY.md), re-
expressed Spark-first:

- DataFrame / Spark SQL for every transform, join, and aggregation
  (the reference has no optimizer; Catalyst supplies pushdown, pruning,
  broadcast, AQE for free).
- Structured Streaming for the four reference pipelines (base_log split,
  base_db CDC routing, DAU dedup, order stream-stream join); checkpoint
  state replaces the reference's Redis offsets / dedup sets / join caches.
- dt-partitioned Parquet serving tables replace ES daily indexes.
- Extension operators for large-scale training-data pipelines: dedup
  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
  similarity search, text analysis, multimodal column plumbing.

Designed for a 1000-executor cluster at ~100 TB: no driver-side loops,
no per-row external I/O, broadcast for small dims, partial aggregation,
AQE-managed shuffles.
"""

__version__ = "0.1.0"
