"""Full-registry oracle sweep at an arbitrary scale factor.

The per-test mirrors run at sf0.001 (fast suite) and sf0.01 (the
driver's gate sf). Some divergences need a bigger haystack: a
half-way-adjacent double for a float round, an LSH cap or skew
fallback actually triggering. This sweep runs EVERY oracled query
against DuckDB at the given sf-dir (default the bench sf, 0.1) and
prints one line per problem — run it once per round:

    python scripts/oracle_sweep.py                      # sf0.1
    SPARK_GRAFT_SWEEP_DIR=/root/testdata/sf0.01 python scripts/oracle_sweep.py

Round-8 catch: q2_min_cost_supplier's round(x, 4) flipped its last
digit between engines on exactly one sf0.1 row (fixed by moving the
unit price to integer basis points).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SWEEP_DIR = os.environ.get("SPARK_GRAFT_SWEEP_DIR", "/root/testdata/sf0.1")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from bigdata_spark_realtime_spark.session import get_spark

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"),
    )
    from oracle_util import assert_matches_oracle

    spark = get_spark(app_name="bsr-oracle-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SWEEP_DIR}/{t}.parquet')"
        )
    oracles = entry.oracle_sql()

    # reuse the suite's comparator (tests/oracle_util): it enforces the
    # driver-relevant dtype-KIND check (int-vs-float divergence raw
    # numpy equality would miss) and handles NULL/NaN columns that
    # would spuriously flag under element equality
    class _DF:  # minimal .toPandas() shim for the helper
        def __init__(self, pdf):
            self._pdf = pdf

        def toPandas(self):
            return self._pdf

    # optional subset: comma-separated query names (r15 tooling — lets a
    # change's blast radius be re-verified in seconds instead of a full
    # sweep; the per-round gate still runs the unfiltered sweep)
    only = {
        n for n in os.environ.get("SPARK_GRAFT_SWEEP_ONLY", "").split(",") if n
    }
    problems = []
    t0 = time.time()
    checked = 0
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        checked += 1
        try:
            got = fn(spark, SWEEP_DIR).toPandas()
        except Exception as ex:  # noqa: BLE001 — report and continue
            problems.append((name, f"SPARK-ERROR {type(ex).__name__}: {ex}"))
            continue
        if name not in oracles:
            continue
        try:
            assert_matches_oracle(_DF(got), con, oracles[name])
        except AssertionError as ex:
            problems.append((name, f"MISMATCH {ex}"))
        except Exception as ex:  # noqa: BLE001
            problems.append((name, f"ORACLE-ERROR {type(ex).__name__}: {ex}"))
    print(f"swept {checked if only else len(oracles)} oracled queries "
          f"at {SWEEP_DIR} in {time.time() - t0:.0f}s")
    for name, why in problems:
        print(f"PROBLEM {name}: {why}")
    if not problems:
        print("ALL EXACT")
    spark.stop()
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
