"""Every registered query hash-matches its DuckDB oracle (sf0.001).

Mirrors the driver's t2 correctness gate so regressions surface in
`pytest` before the round verify runs at sf0.01.
"""

from __future__ import annotations

import pytest

from bigdata_spark_realtime_spark.plans import registry
from tests.oracle_util import assert_matches_oracle

SPECS = registry.load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver's
        return
    assert_matches_oracle(df, duck, spec.oracle)
