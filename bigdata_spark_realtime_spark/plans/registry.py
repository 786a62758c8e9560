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
    # r10 window (exactly 50 queries): 36 round-9 additions that had NO
    # driver row after r5-r9, packed by the 27-module head below with 14
    # already-green drag fillers (precomputed + simulation-verified at
    # the end of round 9 in plans/ROTATION_R10.md, deleted in the
    # rotation commit). Import side effects counted in the window:
    # ext_funnel_tail pulls ext_funnel's 4 base queries forward;
    # ext_graphtri reuses them; ext_sketch_window pulls ext_sketch
    # (hll/cms); olap_extras then adds only rollup_region_nation +
    # approx_aggregates; ext_attrib pulls ext_rangejoin;
    # ext_stream_tail2 reuses ext_colloc; ext_pit reuses ext_scd2;
    # ext_sampling_tail pulls ext_sampling's 3; ext_timeseries2 reuses
    # ext_timeseries; ext_concurrency pulls sessionize's 3; ext_paths
    # reuses them. r5 U r6 U r7 U r8 U r9 U r10 = every query registered
    # before the round-9c wave driver-verified; the 33 pending (32
    # stragglers + the round-10 null-hash probe) are
    # pinned in tests/test_registry.PENDING_FIRST_DRIVER_ROW and drain
    # via the simulated R11/R12 rotations (see ROTATION_R10.md's s3 as
    # archived in the round-10 commit message / VERDICT).
    "bigdata_spark_realtime_spark.plans.ext_funnel_tail",
    "bigdata_spark_realtime_spark.plans.ext_graphrank",
    "bigdata_spark_realtime_spark.plans.ext_graphtri",
    "bigdata_spark_realtime_spark.plans.ext_sketch_window",
    "bigdata_spark_realtime_spark.plans.olap_extras",
    "bigdata_spark_realtime_spark.plans.ext_attrib",
    "bigdata_spark_realtime_spark.plans.ext_snapshot",
    "bigdata_spark_realtime_spark.plans.ext_colloc",
    "bigdata_spark_realtime_spark.plans.ext_stream_tail2",
    "bigdata_spark_realtime_spark.plans.ext_skewcheck",
    "bigdata_spark_realtime_spark.plans.ext_scd2",
    "bigdata_spark_realtime_spark.plans.ext_pit",
    "bigdata_spark_realtime_spark.plans.ext_anomaly",
    "bigdata_spark_realtime_spark.plans.ext_setjoin",
    "bigdata_spark_realtime_spark.plans.ext_binning",
    "bigdata_spark_realtime_spark.plans.ext_contract",
    "bigdata_spark_realtime_spark.plans.ext_sampling_tail",
    "bigdata_spark_realtime_spark.plans.ext_timeseries",
    "bigdata_spark_realtime_spark.plans.ext_timeseries2",
    "bigdata_spark_realtime_spark.plans.ext_concurrency",
    "bigdata_spark_realtime_spark.plans.ext_paths",
    "bigdata_spark_realtime_spark.plans.ext_fuzzy",
    "bigdata_spark_realtime_spark.plans.ext_sampling2",
    "bigdata_spark_realtime_spark.plans.ext_sketch2",
    "bigdata_spark_realtime_spark.plans.ext_fkaudit",
    "bigdata_spark_realtime_spark.plans.ext_zorder",
    "bigdata_spark_realtime_spark.plans.ext_drift",
    # below here every query is OUTSIDE the 50-slot gate window. All
    # were driver-verified in r5-r9 except the 32 pinned stragglers
    # (PENDING_FIRST_DRIVER_ROW); everything stays covered by both
    # local oracle mirrors (tests/test_queries_oracle.py at sf0.001,
    # tests/test_queries_oracle_driver_sf.py at the driver's sf0.01).
    "bigdata_spark_realtime_spark.plans.ext_dsir",
    "bigdata_spark_realtime_spark.plans.ext_bpe",
    "bigdata_spark_realtime_spark.plans.ext_stream_tail",
    "bigdata_spark_realtime_spark.plans.ext_embed",
    "bigdata_spark_realtime_spark.plans.ext_vocab",
    "bigdata_spark_realtime_spark.plans.ext_media_tail2",
    "bigdata_spark_realtime_spark.plans.ext_rangejoin",
    "bigdata_spark_realtime_spark.plans.ext_rollup",
    "bigdata_spark_realtime_spark.plans.ext_sketch_tail",
    "bigdata_spark_realtime_spark.plans.ext_funnel",
    "bigdata_spark_realtime_spark.plans.tpch",
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
    "bigdata_spark_realtime_spark.plans.streaming_queries",
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
    "bigdata_spark_realtime_spark.plans.ext_ivf",
    "bigdata_spark_realtime_spark.plans.ext_dedup",
    "bigdata_spark_realtime_spark.plans.transforms",
    "bigdata_spark_realtime_spark.plans.ext_sampling",
    "bigdata_spark_realtime_spark.plans.ext_srp",
    "bigdata_spark_realtime_spark.plans.ext_similarity",
    "bigdata_spark_realtime_spark.plans.ext_decontam",
    "bigdata_spark_realtime_spark.plans.ext_split",
    "bigdata_spark_realtime_spark.plans.ext_triplets",
    "bigdata_spark_realtime_spark.plans.ext_annops",
    "bigdata_spark_realtime_spark.plans.ext_dedup_impact",
    "bigdata_spark_realtime_spark.plans.ext_embaudit",
    "bigdata_spark_realtime_spark.plans.ext_communities",
    "bigdata_spark_realtime_spark.plans.ext_convert",
    "bigdata_spark_realtime_spark.plans.ext_stream_tail3",
    "bigdata_spark_realtime_spark.plans.ext_windows2",
    "bigdata_spark_realtime_spark.plans.ext_decay",
    "bigdata_spark_realtime_spark.plans.ext_rolling",
    "bigdata_spark_realtime_spark.plans.ext_cohortval",
    "bigdata_spark_realtime_spark.plans.ext_stream_tail4",
    # round 10 (splice rule: new queries register after the pinned
    # window; in PENDING_FIRST_DRIVER_ROW until a rotation seats them)
    "bigdata_spark_realtime_spark.plans.ext_nullprobe",
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
