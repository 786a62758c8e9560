"""Spark-vs-DuckDB comparison helper mirroring the driver's gate:
row count + column names + order-insensitive value match."""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.astype("datetime64[us]").astype(str)
        elif col.dtype == object:
            df[c] = col.map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_matches_oracle(spark_df, duck_con, sql: str, *, float_tol: float = 0.0) -> None:
    got = _normalize(spark_df.toPandas())
    want = _normalize(duck_con.sql(sql).df())

    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"

    for c in got.columns:
        g, w = got[c], want[c]
        # the driver's gate hashes raw materialized values with NO dtype
        # normalization, so an integer column on one side and float on
        # the other (DuckDB HUGEINT sums materialize as float64: 174.0
        # vs 174) hash-diverges there even when every value is equal.
        # Fail that class here, before the float coercion below hides it.
        if len(got) > 0:
            gk, wk = g.dtype.kind, w.dtype.kind
            if gk in "iuf" and wk in "iuf":
                assert (gk == "f") == (wk == "f"), (
                    f"col {c}: dtype kind mismatch spark={g.dtype} "
                    f"oracle={w.dtype} — driver's untyped hash would fail; "
                    "CAST the oracle aggregate (HUGEINT→BIGINT?) or align "
                    "the Spark type"
                )
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            for i, (a, b) in enumerate(zip(g.astype(float), w.astype(float))):
                both_nan = (isinstance(a, float) and math.isnan(a)) and (
                    isinstance(b, float) and math.isnan(b)
                )
                if both_nan:
                    continue
                if float_tol == 0.0:
                    assert a == b, f"col {c} row {i}: spark={a!r} oracle={b!r}"
                else:
                    assert a == b or abs(a - b) <= float_tol * max(1.0, abs(b)), (
                        f"col {c} row {i}: spark={a!r} oracle={b!r}"
                    )
        else:
            same = (g.isna() & w.isna()) | (g == w)
            if not bool(same.all()):
                i = int(same.idxmin())
                raise AssertionError(f"col {c} row {i}: spark={g[i]!r} oracle={w[i]!r}")
