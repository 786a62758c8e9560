"""Deterministic global shuffle for training-data ordering.

LLM training wants each epoch to visit documents in a pseudo-random
order that is (a) reproducible across reruns, (b) different per epoch,
and (c) computable without a global sort. The standard trick is a
keyed hash permutation: order documents by ``hash(seed || doc_id)``.
The reference engine has no ordering operator (its sinks are unordered
Kafka topics); this extends the engine for the training-data pipeline
alongside ext_pack_shards (greedy sequence packing).

Spark-native shape: the permutation is materialized as (shard,
pos_in_shard) rather than one global rank —

- ``shard = hash % N_SHARDS`` is map-side only;
- ``pos_in_shard`` is a row_number over the *shard* partition, so each
  shard sorts locally (Exchange on shard, then a partition-local
  sort); no single global ordering task exists anywhere.

Reading shards 0..N-1 in order, each by pos_in_shard, replays the full
permutation: the shard id is derived from the same hash's high bits,
so the concatenation is exactly the hash-ordered corpus. A new epoch
is a new seed string — a different, equally reproducible permutation.

Scale (100 TB): one shuffle on shard (N_SHARDS here is 64 to keep test
output readable; at cluster scale set it to the writer parallelism —
thousands — so each shard's local sort fits an executor). Skew-free by
construction: md5 output is uniform over shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_spark_realtime_spark.functions import hashing as H
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: epoch seed — a new epoch is a new seed string
EPOCH_SEED = "epoch0"
#: output shards; at cluster scale = writer parallelism
N_SHARDS = 64

_SEED_EXPR = f"'{EPOCH_SEED}|' || CAST(doc_id AS VARCHAR)"
_KEY_SQL = H.h32_sql(_SEED_EXPR)

ORDER_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, {_KEY_SQL} AS okey FROM documents
)
SELECT doc_id,
       CAST(okey % {N_SHARDS} AS INT) AS shard,
       CAST(row_number() OVER (
         PARTITION BY okey % {N_SHARDS} ORDER BY okey, doc_id
       ) AS BIGINT) AS pos_in_shard
FROM keyed
"""


@register("ext_train_order", oracle=ORDER_ORACLE)
def ext_train_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-seeded deterministic shuffle: (shard, pos_in_shard) hash
    permutation of the corpus, shard-local sorts only."""
    docs = load_table(spark, sf_dir, "documents")
    okey = H.h32(F.concat(F.lit(f"{EPOCH_SEED}|"), F.col("doc_id").cast("string")))
    keyed = docs.select("doc_id", okey.alias("okey"))
    shard = (F.col("okey") % N_SHARDS).cast("int")
    w = Window.partitionBy(F.col("okey") % N_SHARDS).orderBy("okey", "doc_id")
    return keyed.select(
        "doc_id",
        shard.alias("shard"),
        F.row_number().over(w).cast("long").alias("pos_in_shard"),
    )
