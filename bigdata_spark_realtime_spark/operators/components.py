"""Connected components over a pair graph — the cluster→keeper step that
turns near-dup *candidate pairs* (MinHash-LSH, SimHash) into an actual
training-data dedup: every document maps to the minimum doc id of its
duplicate cluster, and `keeper_id == doc_id` selects the survivors.

Algorithm: BSP label propagation to the component minimum. Each
iteration every vertex takes the min label over itself and its
neighbors — one shuffle join + one aggregation per round, converging in
O(cluster diameter) rounds. Near-dup clusters are shallow by
construction (a pair needs high similarity, so clusters are dense), so
a handful of rounds suffices at any corpus size; the loop stops early
on a converged round and fails loudly if the cap is hit, rather than
returning a silently-wrong labeling. At the 100 TB design point each
round is a self-equi-join on vertex id — AQE-sized shuffles, no
driver-side state beyond the converged flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _release_checkpoint(df: DataFrame) -> None:
    """Best-effort release of a localCheckpoint'd frame's storage blocks.

    ``DataFrame.unpersist()`` only touches the cache manager, not the
    RDD blocks localCheckpoint pinned; reach the checkpointed RDD
    through the plan's LogicalRDD node and unpersist it directly. Purely
    an early-release optimization — on failure the blocks simply age out
    when the loop's frames are garbage collected."""
    try:
        df._jdf.queryExecution().logical().rdd().unpersist(False)
    except Exception:
        pass


def connected_components(
    edges: DataFrame, src: str, dst: str, max_rounds: int = 25
) -> DataFrame:
    """edges(src, dst) undirected → (id, component) with component = min
    vertex id reachable from `id`. Only vertices appearing in `edges` are
    returned; callers left-join isolated vertices back (their component
    is themselves)."""
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.unionByName(
        sym.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    sym.persist()
    # localCheckpoint per round: iterative plans grow multiplicatively if
    # each round's DataFrame keeps the previous round's lineage (planning
    # itself OOMs near ~15 rounds); truncating to the materialized result
    # keeps every round's plan constant-size. On a real cluster use
    # reliable checkpointing if executor loss during the loop matters.
    # initialization IS the first propagation round: from identity
    # labels, one BSP step yields min(self, neighbors) — and `sym`
    # already has every neighbor per vertex, so that round needs no
    # join at all. Shallow (clique-like) near-dup clusters converge
    # here immediately and the loop's first iteration just confirms it.
    labels = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select(
            F.col("u").alias("id"),
            F.least("u", "mn").alias("component"),
        )
        .localCheckpoint()
    )
    ckpt = labels  # the checkpointed frame backing `labels` (release handle)
    try:
        for _ in range(max_rounds):
            # carry each vertex's previous label through the same
            # aggregation (`old` is non-null exactly once per id — its
            # own labels row), so convergence detection needs no second
            # join: one shuffle join + one shuffle agg per round, then a
            # cheap filter-count over the checkpointed result
            nbr = sym.join(
                labels.withColumnRenamed("id", "v"), "v"
            ).select(
                F.col("u").alias("id"),
                "component",
                F.lit(None).cast("long").alias("old"),
            )
            own = labels.select(
                "id", "component", F.col("component").alias("old")
            )
            # NON-eager checkpoint: the convergence count below is the
            # materializing action, so each round runs ONE job
            # (join + agg + store + count) instead of an eager-checkpoint
            # job followed by a count job re-reading the stored blocks
            stepped = (
                nbr.unionByName(own)
                .groupBy("id")
                .agg(
                    F.min("component").alias("component"),
                    F.max("old").alias("old"),
                )
                .localCheckpoint(eager=False)
            )
            changed = stepped.where(F.col("component") != F.col("old")).count()
            # release the superseded round's checkpointed blocks — without
            # this up to max_rounds block sets stay pinned in executor
            # storage for the life of the loop
            _release_checkpoint(ckpt)
            ckpt = stepped
            labels = stepped.select("id", "component")
            if changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    finally:
        sym.unpersist()


def resolve_keepers(
    all_ids: DataFrame, id_col: str, edges: DataFrame, src: str, dst: str
) -> DataFrame:
    """(id_col, keeper_id) for EVERY row of `all_ids`: min id of the
    duplicate cluster, or the id itself when it has no near-dups."""
    comp = connected_components(edges, src, dst)
    return (
        all_ids.join(comp, all_ids[id_col] == comp["id"], "left")
        .select(
            all_ids[id_col],
            F.coalesce(comp["component"], all_ids[id_col]).alias("keeper_id"),
        )
    )
