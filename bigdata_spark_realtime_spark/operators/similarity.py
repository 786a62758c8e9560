"""IVF approximate-nearest-neighbor search over embedding columns.

The scale path for similarity search at 100 TB: a KMeans coarse
quantizer (pyspark.ml, trained once) assigns every vector to a cell;
queries probe only their n_probe nearest cells, so the candidate scan is
|corpus| * n_probe / n_cells instead of the full corpus. The plans-layer
`ext_ann_bucketed_topk` demonstrates the same shape with a precomputed
cell id; this module is the real trained-index variant.

Everything stays DataFrame-native: centroids live in a small broadcast
DataFrame, distances are zip_with folds, top-k is a rank window — no
driver-side loops, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F



def _sq_dist(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def seeded_centroids(
    emb: DataFrame, n_cells: int = 16, stride: int = 31, offset: int = 7
) -> DataFrame:
    """Deterministic coarse-quantizer centroids: the first ``n_cells``
    corpus vectors whose vec_id ≡ offset (mod stride), numbered 0..n-1
    in vec_id order.

    This is the oracle-replayable alternative to KMeans training: a SQL
    engine can reproduce the exact same centroid set (modulo filter +
    ORDER BY vec_id LIMIT n), so the full IVF probe path — assignment,
    n_probe cell selection, cell-local scoring — is hash-checkable
    end-to-end. At 100 TB the selection is a metadata-cheap filter scan;
    the 16-row result broadcasts everywhere.
    """
    w = Window.orderBy("vec_id")
    return (
        emb.where(F.col("vec_id") % stride == offset)
        .orderBy("vec_id")
        .limit(n_cells)
        .select(
            (F.row_number().over(w) - 1).alias("cell"),
            F.col("embedding").alias("centroid"),
        )
    )


def assign_cells(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid (squared-L2) single assignment: emb + `cell`,
    computed MAP-SIDE in one Arrow kernel — zero exchanges, zero joins.

    Until round 15 this was a broadcast crossJoin (|corpus| × n_cells
    materialized JVM rows, each carrying the full embedding array)
    followed by an interpreted per-row `_sq_dist` fold and a
    row_number window SHUFFLED on vec_id. Correct, but the row
    explosion is the term that dominates once n_cells grows with the
    corpus (FAISS sizes nlist ≈ √n): the round-15 scale smoke read the
    30×-rows/30×-cells point at 86.7 s, ~81 s of it this one stage.
    The kernel does the identical arithmetic batch-at-a-time in C.

    Bit-exactness contract (the reason this stays hash-identical to
    the `{SQD_E}, cell` SQL-oracle tie rule):

    - distance: the j-loop accumulates ``acc += (x_j - c_j)²`` in
      ascending element order from 0.0 — one IEEE-double multiply then
      one add per element, the exact rounding sequence of the
      `_sq_dist` left fold (`F.aggregate`) and of the oracles' SQD_E
      expression. NumPy's pairwise-summation shortcut never engages
      because each += is a single elementwise add.
    - ties: centroids are sorted by `cell` before stacking, and
      ``np.argmin`` returns the FIRST minimum — i.e. the lowest cell
      among bit-equal distances, the window's `orderBy(dist, cell)`.

    The centroid fetch is the quantizer's bounded model artifact
    (n_cells rows — the same class as ext_embed's L×64 centroid
    fetch); `emb` must be NULL-vector-free (`corpus.emb_double`), as
    the Arrow kernels downstream already require."""
    import numpy as np

    from pyspark.sql.types import StructField, StructType

    cell_field = centroids.schema["cell"]
    out_schema = StructType(
        list(emb.schema.fields) + [StructField("cell", cell_field.dataType)]
    )
    cents_pdf = centroids.orderBy("cell").toPandas()
    if len(cents_pdf) == 0:
        # empty quantizer (0-rows boundary): the crossJoin form yielded
        # no rows; preserve that contract with an empty frame
        return emb.sparkSession.createDataFrame([], out_schema)
    cm = np.stack(cents_pdf["centroid"].to_numpy()).astype("float64")
    cell_ids = cents_pdf["cell"].to_numpy()

    def assign(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            xm = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            acc = np.zeros((xm.shape[0], cm.shape[0]))
            for j in range(cm.shape[1]):
                d = xm[:, j : j + 1] - cm[None, :, j]
                acc += d * d
            out = pdf.copy()
            out["cell"] = cell_ids[np.argmin(acc, axis=1)]
            yield out

    return emb.mapInPandas(assign, out_schema)


def build_ivf_index(
    emb: DataFrame, n_cells: int = 16, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Train the coarse quantizer and assign every vector to a cell.

    Returns (assigned, centroids): ``assigned`` = emb + `cell` int,
    ``centroids`` = (cell, centroid array<double>) — small enough to
    broadcast into every probe.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = emb.select(
        "vec_id", array_to_vector(F.col("embedding")).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(train)
    assigned = (
        model.transform(train)
        .select("vec_id", F.col("prediction").alias("cell"))
        .join(emb, "vec_id")
    )
    centroids = emb.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    digits: int = 6,
) -> DataFrame:
    """queries(query_id, embedding) → top-k neighbors by cosine, scanning
    only each query's n_probe nearest cells.

    PRECONDITION: ``assigned`` must be single-assignment — exactly one
    cell per vec_id, as ``build_ivf_index`` produces. The scoring path
    relies on cells partitioning the corpus (a neighbor is reachable via
    exactly one probed cell, so no (query_id, neighbor_id) dedup is
    needed). A multi-assigned index (e.g. multi-probe insertion for
    recall) would yield duplicate pairs that silently consume top-k
    slots; dedupe on (query_id, neighbor_id) before calling if you
    build such an index."""
    q_cells = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("dist", _sq_dist(F.col("embedding"), F.col("centroid")))
        .withColumn(
            "cell_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("dist", "cell")
            ),
        )
        .where(F.col("cell_rank") <= n_probe)
        .select("query_id", F.col("embedding").alias("q_emb"), "cell")
    )
    # no dedup needed: single-assignment IVF cells partition the corpus,
    # so a neighbor is reachable via exactly one probed cell — a
    # .distinct() here would burn a full extra shuffle for nothing.
    # Scoring is the vectorized per-cell kernel: queries-probing-a-cell
    # and the cell's candidates meet in one Arrow batch, one Q @ C.T.
    # Each cell emits its per-query top-k; a query probes n_probe cells,
    # so the global window reduces k × n_probe rows per query.
    from bigdata_spark_realtime_spark.operators.vector_ops import (
        topk_neighbors_blocked,
    )

    cell_topk = topk_neighbors_blocked(
        assigned,
        q_cells.select("cell", F.col("query_id").alias("vec_id"), F.col("q_emb").alias("embedding")),
        k,
        block_col="cell",
        digits=digits,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        cell_topk.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim")
    )


def split_oversized_cells(assigned: DataFrame, max_cell: int) -> DataFrame:
    """Split any cell larger than ``max_cell`` into hash-assigned
    sub-cells so a per-cell Arrow kernel's matrix stays bounded no
    matter how skewed the quantizer's clusters are.

    The SemDeDup pruning path (vector_ops.semantic_dedup_drops) scores
    one cell per Arrow batch; a degenerate cluster holding 1% of a
    100 TB corpus would otherwise OOM a single task. Sub-cell ids are
    ``cell * 1_000_000 + xxhash64(vec_id) % n_sub`` (contract:
    n_sub < 1e6), trading the cross-sub-cell pairs away — the same
    approximation SemDeDup itself makes by never comparing across
    clusters. The size census is one small agg (one row per cell)
    broadcast back; the corpus side is never shuffled by this helper
    (the kernel's groupBy is the one exchange, exactly as unsplit).
    """
    sizes = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n_in_cell"))
    n_sub = F.ceil(F.col("n_in_cell") / max_cell).cast("long")
    return (
        assigned.join(F.broadcast(sizes), "cell")
        .withColumn(
            "cell",
            F.col("cell").cast("long") * 1_000_000
            + F.pmod(F.xxhash64("vec_id"), n_sub),
        )
        .drop("n_in_cell")
    )
