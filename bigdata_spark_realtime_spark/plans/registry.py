"""Registry binding every query to its DuckDB oracle SQL.

The driver contract (``__spark_entry__.py``) requires, per implemented
operator: a ``queries()`` callable ``(spark, sf_dir) -> DataFrame`` and a
matching ``oracle_sql()`` ANSI-SQL string for DuckDB over the same
parquet tables. Column names must match exactly (the comparison sorts
columns by name and hashes values) — every computed column is aliased
identically on both sides.

Registration is declarative::

    @register("q1_pricing_summary", oracle="SELECT ...")
    def q1(spark, sf_dir): ...

Queries whose semantics are not SQL-expressible (custom stateful
streaming) register with ``oracle=None`` and get the driver's weaker
rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


QUERIES: dict[str, QuerySpec] = {}

#: plan modules scanned by :func:`load_all`.
#:
#: ORDER IS A DOCUMENTED CONTRACT (pinned by tests/test_registry.py):
#: the external correctness gate hash-checks the first 50 registered
#: queries per round. Round 5's window covered the 50 queries registered
#: by the trailing eight modules below; this round leads with everything
#: that window missed, so r5 ∪ r6 gives every one of the 100 registered
#: queries an independent driver-verified row — full-registry coverage
#: in two rounds. The local oracle mirror (tests/test_queries_oracle.py)
#: always runs all queries regardless of this order; which queries fall
#: outside a given round's external window is recorded in the round
#: VERDICT.
_PLAN_MODULES = (
    # r6 window (exactly 50 queries): the 49 rows r5 left unverified —
    # scalar_fns first to clear f1_f2_dt_hr_derive's standing r4 FAIL —
    # plus the newly gated real-quantizer IVF query (ext_ivf).
    "bigdata_spark_realtime_spark.plans.scalar_fns",
    "bigdata_spark_realtime_spark.plans.serving",
    "bigdata_spark_realtime_spark.plans.joins",
    "bigdata_spark_realtime_spark.plans.ext_text",
    "bigdata_spark_realtime_spark.plans.ext_multimodal",
    "bigdata_spark_realtime_spark.plans.ext_asof",
    "bigdata_spark_realtime_spark.plans.ext_packing",
    "bigdata_spark_realtime_spark.plans.dedup",
    "bigdata_spark_realtime_spark.plans.aggregations",
    "bigdata_spark_realtime_spark.plans.sort_limit",
    "bigdata_spark_realtime_spark.plans.windows",
    "bigdata_spark_realtime_spark.plans.analytic",
    "bigdata_spark_realtime_spark.plans.sessionize",
    "bigdata_spark_realtime_spark.plans.olap_extras",
    "bigdata_spark_realtime_spark.plans.ext_ivf",
    # r5-verified (CORRECTNESS_r05.json: 50/50 green)
    "bigdata_spark_realtime_spark.plans.tpch",
    "bigdata_spark_realtime_spark.plans.ext_dedup",
    "bigdata_spark_realtime_spark.plans.transforms",
    "bigdata_spark_realtime_spark.plans.ext_sampling",
    "bigdata_spark_realtime_spark.plans.streaming_queries",
    "bigdata_spark_realtime_spark.plans.ext_srp",
    "bigdata_spark_realtime_spark.plans.ext_similarity",
    "bigdata_spark_realtime_spark.plans.ext_decontam",
    # new in round 6, registered AFTER the pinned window (51+): covered
    # by BOTH local mirrors now (all-queries at sf0.001 AND the
    # out-of-window tail at the driver's sf0.01 —
    # tests/test_queries_oracle_driver_sf.py). ROUND-7 PLAN: rotate the
    # 20 never-driver-verified queries below (ext_quality×4, ext_semantic,
    # ext_mixture×2, ext_pii, ext_lm, ext_substring, ext_tfidf, ext_order,
    # ext_chunk, ext_profile×2, ext_curation3, ext_bm25,
    # stream_decontaminate, stream_dedup_minhash, stream_lm_bucket) into
    # the first-50 window, then fill the remaining slots with the
    # oldest-verified rows (r5's tpch block); update the
    # tests/test_registry.py window pin in the same commit. (The list
    # below grew to 21 with ext_hybrid — still fits one 50-slot window
    # with 29 slots to spare.)
    "bigdata_spark_realtime_spark.plans.ext_quality",
    "bigdata_spark_realtime_spark.plans.ext_semantic",
    "bigdata_spark_realtime_spark.plans.ext_mixture",
    "bigdata_spark_realtime_spark.plans.ext_pii",
    "bigdata_spark_realtime_spark.plans.ext_lm",
    "bigdata_spark_realtime_spark.plans.ext_substring",
    "bigdata_spark_realtime_spark.plans.ext_tfidf",
    "bigdata_spark_realtime_spark.plans.ext_order",
    "bigdata_spark_realtime_spark.plans.ext_chunk",
    "bigdata_spark_realtime_spark.plans.ext_profile",
    "bigdata_spark_realtime_spark.plans.ext_curation3",
    "bigdata_spark_realtime_spark.plans.ext_bm25",
    "bigdata_spark_realtime_spark.plans.ext_hybrid",
    "bigdata_spark_realtime_spark.plans.ext_sketch",
    "bigdata_spark_realtime_spark.plans.ext_media_tail",
)


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    # import errors propagate — a typo'd module name must fail the gate
    # loudly, not silently shrink the registered query set
    for mod in _PLAN_MODULES:
        importlib.import_module(mod)
    return QUERIES


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in load_all().items()}


def all_oracles() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None
    }
