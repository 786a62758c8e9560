"""Community detection on the co-visitation graph: fixed-k min-label
propagation.

PageRank (`plans/ext_graphrank.py`) ranks items; triangle counting
(`plans/ext_graphtri.py`) measures local density; this operator
CLUSTERS: every item adopts the minimum item-id reachable within k=3
hops — three Jacobi rounds of min-label propagation, the bounded-depth
variant of connected components (the dedup resolver,
`operators/components.py`, runs the converging version; a FIXED
iteration count makes the computation a static dataflow both engines
replay exactly, the ext_item_pagerank discipline). After 3 rounds,
items ≤ 3 hops from their component minimum share a label — at the
co-visitation graph's hub-dominated diameter that is the whole
component for every cluster that matters to a recommender.

Exactness: labels are item ids; one min per round — pure int64.
Scale (100 TB): the graph derives from the SAME quota-capped
(user, item) set as every co-visitation operator (skew-guarded pair
expansion); each round is one hash join edges ⋈ labels + one min
groupBy — 2 shuffles per round on edge-cardinality rows, raw events
never re-read; self-loops fold the "keep own label" min into the same
aggregation. Edges persist across the three rounds (scoped_persist).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.corpus import scoped_persist
from bigdata_spark_realtime_spark.plans.ext_funnel import (
    COOC_CAPPED_CTE,
    COOC_MAX_ITEMS_PER_USER,
    _cooc_capped_items,
    _cooc_capped_pairs,
)
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: fixed propagation rounds
N_ROUNDS = 3


def _round_cte(prev: str, cur: str) -> str:
    return f"""
{cur} AS (
  SELECT e.dst AS item, min({prev}.lbl) AS lbl
  FROM und_self e JOIN {prev} ON {prev}.item = e.src
  GROUP BY e.dst
)"""


COMMUNITIES_ORACLE = (
    f"""
WITH {COOC_CAPPED_CTE},
edges0 AS (
  SELECT DISTINCT a.item AS src, b.item AS dst
  FROM capped a JOIN capped b
    ON a.user_id = b.user_id AND a.item < b.item
),
nodes AS (
  SELECT DISTINCT item FROM capped
),
und_self AS (
  SELECT src, dst FROM edges0
  UNION ALL SELECT dst, src FROM edges0
  UNION ALL SELECT item, item FROM nodes
),
l0 AS (SELECT item, item AS lbl FROM nodes),"""
    + ",".join(_round_cte(f"l{k}", f"l{k + 1}") for k in range(N_ROUNDS))
    + f"""
SELECT item, CAST(lbl AS BIGINT) AS community
FROM l{N_ROUNDS}
"""
)


@register("ext_item_communities", oracle=COMMUNITIES_ORACLE)
def ext_item_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k={N_ROUNDS} min-label propagation over the quota-capped
    co-visitation graph (self-loops fold label retention into the
    per-round min); labels are exact item ids."""
    ev = load_table(spark, sf_dir, "events")
    # capped feeds BOTH the pair expansion and the nodes distinct —
    # persist it so the quota window runs once (r15; 2 int64s per row)
    capped = scoped_persist(
        _cooc_capped_items(ev, COOC_MAX_ITEMS_PER_USER),
        "communities_edges",
        keep=2,
    )
    # array-side within-user pair expansion (no self-join; see
    # plans/ext_funnel._cooc_capped_pairs, r15 optimization round);
    # `capped` is passed through so nodes and pairs share one subtree
    edges0 = (
        _cooc_capped_pairs(ev, COOC_MAX_ITEMS_PER_USER, capped=capped)
        .select(F.col("item_a").alias("src"), F.col("item_b").alias("dst"))
        .distinct()
    )
    nodes = capped.select("item").distinct()
    # both directions in one explode pass over edges0 (the union form
    # scanned the distinct-pair subtree twice — r15); self-loops ride
    # in from the nodes frame as before
    und_self = (
        edges0.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .unionByName(
            nodes.select(F.col("item").alias("src"), F.col("item").alias("dst"))
        )
    )
    # keep=2: this invocation registers TWO frames in the scope (capped
    # above and und_self), both alive for the whole 3-round loop
    und_self = scoped_persist(und_self, "communities_edges", keep=2)
    lbl = nodes.select("item", F.col("item").alias("lbl"))
    for _ in range(N_ROUNDS):
        lbl = (
            und_self.join(lbl, und_self["src"] == lbl["item"])
            .groupBy(F.col("dst").alias("nitem"))
            .agg(F.min("lbl").alias("lbl"))
            .select(F.col("nitem").alias("item"), "lbl")
        )
    return lbl.select("item", F.col("lbl").cast("bigint").alias("community"))
