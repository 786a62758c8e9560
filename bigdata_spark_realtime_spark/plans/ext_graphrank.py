"""Co-visitation graph ranking: integer PageRank over item pairs.

The recommender/curation step after `ext_item_cooccurrence` builds the
item graph: rank items by random-walk centrality so "hub" items (the
ones co-viewed with everything) can be down-weighted in co-visitation
recommendations and crawl/curation frontiers. Three Jacobi iterations
of damped PageRank (Page et al. 1999) — fixed iteration count, so the
whole computation is a static dataflow both engines replay exactly.

Exactness: ranks are integer-quantized (start SCALE = 10⁶ per node);
one iteration is ``r' = 15·SCALE DIV 100 + (85 · Σ_{{j→i}} (r(j) DIV
deg(j))) DIV 100`` — every division is a truncating integer DIV
applied in the same order in both engines, so the ranks are
bit-identical, no float mass anywhere. The graph itself derives from
the SAME quota-capped (user, item) set as the co-occurrence operator
(`plans/ext_funnel.COOC_CAPPED_CTE`), so the skew guard bounds the
edge expansion here too.

Scale (100 TB): edges materialize once (the guarded pair expansion);
each iteration is one hash join edges ⋈ ranks on the source key plus
one groupBy on the destination key — the classic Pregel-on-DataFrame
shape, 2 shuffles per iteration on edge-cardinality rows, raw events
never re-read. Fixed k=3 keeps lineage bounded (production checkpoints
per iteration like operators/components.py does for label
propagation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.ext_funnel import (
    COOC_CAPPED_CTE,
    _cooc_capped_pairs,
    COOC_MAX_ITEMS_PER_USER,
)
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: rank quantization: every node starts at SCALE
RANK_SCALE = 1_000_000
#: damped base term 0.15 · SCALE
_BASE = 15 * RANK_SCALE // 100
#: fixed Jacobi iterations
N_ITERS = 3


def _iter_cte(prev: str, cur: str) -> str:
    return f"""
{cur} AS (
  SELECT e.dst AS item,
         {_BASE} + (85 * CAST(sum({prev}.r // deg.d) AS BIGINT)) // 100 AS r
  FROM edges e
  JOIN {prev} ON {prev}.item = e.src
  JOIN deg ON deg.item = e.src
  GROUP BY e.dst
)"""


PAGERANK_ORACLE = (
    f"""
WITH {COOC_CAPPED_CTE},
edges0 AS (
  SELECT DISTINCT a.item AS src, b.item AS dst
  FROM capped a JOIN capped b
    ON a.user_id = b.user_id AND a.item < b.item
),
edges AS (
  SELECT src, dst FROM edges0 UNION ALL SELECT dst, src FROM edges0
),
deg AS (
  SELECT src AS item, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src
),
r0 AS (
  SELECT item, CAST({RANK_SCALE} AS BIGINT) AS r FROM deg
),"""
    + ",".join(_iter_cte(f"r{k}", f"r{k + 1}") for k in range(N_ITERS))
    + f"""
SELECT item, CAST(r AS BIGINT) AS rank_q FROM r{N_ITERS}
"""
)


@register("ext_item_pagerank", oracle=PAGERANK_ORACLE)
def ext_item_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer damped PageRank (3 fixed iterations) over the undirected
    co-visitation item graph built from the quota-capped (user, item)
    set."""
    ev = load_table(spark, sf_dir, "events")
    # array-side within-user pair expansion (no self-join; see
    # plans/ext_funnel._cooc_capped_pairs, r15 optimization round)
    edges0 = (
        _cooc_capped_pairs(ev, COOC_MAX_ITEMS_PER_USER)
        .select(F.col("item_a").alias("src"), F.col("item_b").alias("dst"))
        .distinct()
    )
    # both directions in ONE pass over edges0 (explode of a 2-struct
    # array) — the union form scanned the distinct-pair subtree twice
    # (r15 optimization round)
    edges = edges0.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # edges joins once per iteration and deg twice (degree division +
    # the contrib join): without a persist the quota window + pair
    # expansion replay for EVERY consumer — 188 exchanges in the k=3
    # plan vs ~20 with the reused frames pinned (scoped: the previous
    # invocation's frames are evicted on re-entry, round-7 ADVICE
    # pattern)
    from bigdata_spark_realtime_spark.plans.corpus import scoped_persist

    edges = scoped_persist(edges, "pagerank_edges", keep=2)
    deg = edges.groupBy(F.col("src").alias("item")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    deg = scoped_persist(deg, "pagerank_edges", keep=2)
    r = deg.select("item", F.lit(RANK_SCALE).cast("bigint").alias("r"))
    for _ in range(N_ITERS):
        contrib = (
            r.join(deg, "item")
            .select(
                F.col("item").alias("src"),
                F.expr("r DIV d").alias("c"),
            )
        )
        r = (
            edges.join(contrib, "src")
            .groupBy(F.col("dst").alias("item"))
            .agg(
                (
                    F.lit(_BASE)
                    + F.expr("(85 * sum(c)) DIV 100")
                )
                .cast("bigint")
                .alias("r")
            )
        )
    return r.select("item", F.col("r").alias("rank_q"))
