"""Out-of-window queries hash-match their oracles at the DRIVER's SF.

The external gate checks only the first 50 registered queries per round
(tests/test_registry.py pins the window), at sf0.01. The all-queries
mirror (test_queries_oracle.py) runs at sf0.001 — but SF-dependent bugs
are real (round 4 lost a query to an events-loader dtype that only the
bigger file exhibited). This module closes that gap: every query
OUTSIDE the pinned window — exactly the rows whose only evidence is
local until a future rotation — is checked at sf0.01, the driver's SF,
so the next rotation cannot surface an SF-specific failure the suite
never saw.
"""

from __future__ import annotations

import pytest

from bigdata_spark_realtime_spark.plans import registry
from tests.conftest import ORACLE_SF_DIR
from tests.oracle_util import assert_matches_oracle

SPECS = registry.load_all()
_TAIL = list(SPECS)[50:]


@pytest.fixture(scope="module")
def duck_driver_sf():
    import duckdb

    from bigdata_spark_realtime_spark.sources.tables import TABLE_NAMES

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{ORACLE_SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_TAIL))
def test_out_of_window_query_matches_oracle_at_driver_sf(
    name, spark, duck_driver_sf
):
    spec = SPECS[name]
    df = spec.fn(spark, ORACLE_SF_DIR)
    if spec.oracle is None:
        assert df.count() >= 0
        return
    assert_matches_oracle(df, duck_driver_sf, spec.oracle)
