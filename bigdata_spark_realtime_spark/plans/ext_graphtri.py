"""Triangle counting over the co-visitation item graph.

Per-item triangle participation is the standard graph-quality /
community-density signal (local clustering, spam-cluster detection,
recommender neighborhood strength) on the same item graph PageRank
already ranks (`plans/ext_graphrank.py`). The graph derives from the
SAME quota-capped (user, item) set as every other co-visitation
operator (`plans/ext_funnel.COOC_CAPPED_CTE`), so one bot user cannot
inflate the edge set.

Scale shape — degree-ordered orientation (the MapReduce triangle
classic, Cohen 2009 / Suri-Vassilvitskii 2011): orient every edge from
its lower-(degree, id) endpoint to the higher one, enumerate wedges
only at each edge's LOW endpoint, and close them against the oriented
edge set. Out-degree under this orientation is O(√m), so wedge count
is Σ C(outdeg, 2) — bounded even at hub items where the naive
enumeration's C(deg, 2) explodes quadratically. Three hash joins on
edge-cardinality rows, no global sort; each triangle {x≺y≺z} is
produced exactly once (only the minimum vertex has two out-edges into
the triangle).

Exactness: counts and degrees only — no arithmetic beyond int64
count/compare, so DuckDB reproduces the result bit-for-bit from the
identical oriented construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.corpus import scoped_persist
from bigdata_spark_realtime_spark.plans.ext_funnel import (
    COOC_CAPPED_CTE,
    COOC_MAX_ITEMS_PER_USER,
    _cooc_capped_pairs,
)
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

TRIANGLE_ORACLE = f"""
WITH {COOC_CAPPED_CTE},
edges0 AS (
  SELECT DISTINCT a.item AS src, b.item AS dst
  FROM capped a JOIN capped b
    ON a.user_id = b.user_id AND a.item < b.item
),
und AS (
  SELECT src, dst FROM edges0 UNION ALL SELECT dst, src FROM edges0
),
deg AS (
  SELECT src AS item, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY src
),
fwd AS (
  SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.src < e.dst)
              THEN e.src ELSE e.dst END AS u,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.src < e.dst)
              THEN e.dst ELSE e.src END AS v,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.src < e.dst)
              THEN db.d ELSE da.d END AS dv
  FROM edges0 e
  JOIN deg da ON da.item = e.src
  JOIN deg db ON db.item = e.dst
),
tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM fwd e1
  JOIN fwd e2 ON e1.u = e2.u
    AND ((e1.dv < e2.dv) OR (e1.dv = e2.dv AND e1.v < e2.v))
  JOIN fwd e3 ON e3.u = e1.v AND e3.v = e2.v
),
per_item AS (
  SELECT item, CAST(count(*) AS BIGINT) AS n_tri FROM (
    SELECT x AS item FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY item
)
SELECT deg.item, deg.d AS degree,
       CAST(coalesce(per_item.n_tri, 0) AS BIGINT) AS n_tri
FROM deg LEFT JOIN per_item ON per_item.item = deg.item
"""


@register("ext_triangle_count", oracle=TRIANGLE_ORACLE)
def ext_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item (degree, triangle-count) over the quota-capped
    co-visitation graph via degree-ordered edge orientation — wedges
    enumerate only at the low-(degree, id) endpoint, so out-degree (and
    with it the self-join blow-up) is O(√edges) instead of the raw hub
    degree."""
    ev = load_table(spark, sf_dir, "events")
    # array-side within-user pair expansion (no self-join; see
    # plans/ext_funnel._cooc_capped_pairs, r15 optimization round)
    edges0 = (
        _cooc_capped_pairs(ev, COOC_MAX_ITEMS_PER_USER)
        .select(F.col("item_a").alias("src"), F.col("item_b").alias("dst"))
        .distinct()
    )
    # edges0 feeds BOTH the degree table (via und) and the orientation
    # join — persist it so the pair expansion + distinct run once
    # (r15; the und union itself is now a single explode pass)
    edges0 = scoped_persist(edges0, "tri_graph", keep=3)
    und = edges0.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    deg = und.groupBy(F.col("src").alias("item")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    # deg joins twice into the orientation and once into the final
    # projection; edges0 feeds orientation only, but fwd feeds THREE
    # legs of the triangle join — persist both reused frames so the
    # quota window + pair expansion don't replay per consumer (the
    # PageRank lesson: 188 → ~20 exchanges)
    deg = scoped_persist(deg, "tri_graph", keep=3)
    da = deg.select(F.col("item").alias("src"), F.col("d").alias("da"))
    db = deg.select(F.col("item").alias("dst"), F.col("d").alias("db"))
    low_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("src") < F.col("dst"))
    )
    fwd = (
        edges0.join(da, "src")
        .join(db, "dst")
        .select(
            F.when(low_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
            F.when(low_first, F.col("dst")).otherwise(F.col("src")).alias("v"),
            F.when(low_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
        )
    )
    fwd = scoped_persist(fwd, "tri_graph", keep=3)
    e1 = fwd.select(
        F.col("u").alias("u1"), F.col("v").alias("y"), F.col("dv").alias("dy")
    )
    e2 = fwd.select(
        F.col("u").alias("u2"), F.col("v").alias("z"), F.col("dv").alias("dz")
    )
    wed = e1.join(
        e2,
        (F.col("u1") == F.col("u2"))
        & (
            (F.col("dy") < F.col("dz"))
            | ((F.col("dy") == F.col("dz")) & (F.col("y") < F.col("z")))
        ),
    )
    closing = fwd.select(F.col("u").alias("y"), F.col("v").alias("z"))
    tri = wed.join(closing, ["y", "z"]).select(
        F.col("u1").alias("x"), "y", "z"
    )
    # all three corners in ONE pass over the triangle rows — the union
    # form re-ran the wedge join per corner (r15 optimization round)
    per_item = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tri"))
    )
    return deg.join(per_item, "item", "left").select(
        "item",
        F.col("d").alias("degree"),
        F.coalesce("n_tri", F.lit(0)).cast("bigint").alias("n_tri"),
    )
