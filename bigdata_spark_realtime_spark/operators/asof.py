"""As-of join — a custom operator Spark lacks natively.

The naive formulation (theta-join on `r.t <= l.t` + argmax) is a
pairwise product — unusable at scale. This is the union-and-window
form: tag both inputs, union, one window pass per key ordered by
(time, tag) carrying the last non-null right-side value forward, keep
the left rows. One shuffle on the key, linear in |L|+|R| — the shape
`pd.merge_asof` takes per group, but fully distributed and JVM-side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: tuple[str, str],
    time: tuple[str, str],
    payload: Sequence[str],
) -> DataFrame:
    """For each left row, attach the right row with the greatest time
    at-or-before the left row's time, per key (inclusive, left-outer).

    on = (left_key, right_key); time = (left_time, right_time);
    payload = right columns to carry. The right side must be unique per
    (key, time) — pre-reduce it if not, or the winner is undefined.
    """
    lk, rk = on
    lt, rt = time
    l_tag = left.select(
        F.col(lk).alias("__k"),
        F.col(lt).alias("__t"),
        F.lit(1).alias("__tag"),
        F.struct(*left.columns).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload],
    )
    r_tag = right.select(
        F.col(rk).alias("__k"),
        F.col(rt).alias("__t"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast(l_tag.schema["__left"].dataType).alias("__left"),
        *payload,
    )
    # order rows (tag 0) sort before left rows (tag 1) at equal time →
    # "at-or-before" is inclusive, like DuckDB/pandas merge_asof
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "__tag",
        "__left",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload],
    )
    return carried.where(F.col("__tag") == 1).select("__left.*", *payload)
