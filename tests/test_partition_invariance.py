"""Partition-count invariance for the never-driver-verified queries.

The driver gate is these queries' only independent check, and each gets
exactly one shot per rotation — a FAIL there would be the build's
first. The local oracle mirrors always run under one fixed
parallelism, so a result that silently depends on the shuffle layout
(a window tie resolved by partition order, a non-associative merge, an
undeterministic first()) would sail through them and explode at the
gate, or worse, at 1000 executors where the layout is never the same
twice. This mirror re-runs every PENDING_FIRST_DRIVER_ROW query under
a sibling session with a deliberately different, prime
``spark.sql.shuffle.partitions`` and requires row-identical results.

Streaming twins run their full micro-batch replay under both layouts —
complete-mode state merging must be partitioning-independent too.
"""

from __future__ import annotations

import pytest

from bigdata_spark_realtime_spark.plans import registry
from test_registry import CURRENT_ROTATION_TARGETS, PENDING_FIRST_DRIVER_ROW


def _canon(v):
    """Totally-orderable, NaN-stable stand-in for a cell value.

    Raw rows fail both comparisons this test needs: NaN != NaN makes
    identical results compare unequal, and container cells (maps,
    arrays of structs) are unorderable under sorted(). Every value maps
    to a nested tuple of primitives where NaN collapses to a marker and
    containers recurse, so sort and equality are well-defined for any
    schema a future pending query might emit."""
    if v is None:
        return (0,)
    if isinstance(v, float) and v != v:
        return (1,)
    if isinstance(v, dict):
        return (2, tuple(sorted((k, _canon(x)) for k, x in v.items())))
    if isinstance(v, (list, tuple)):
        return (3, tuple(_canon(x) for x in v))
    return (4, type(v).__name__, repr(v))


def _rows(session, fn, sf_dir):
    df = fn(session, sf_dir)
    cols = sorted(df.columns)
    rows = [
        tuple(_canon(r[c]) for c in cols)
        for r in df.select(*cols).collect()
    ]
    return sorted(rows)


@pytest.fixture(scope="module")
def perturbed(spark):
    """Sibling session with a deliberately different execution layout.
    newSession() shares the JVM/catalog but takes its own SQL confs
    (discarded with the session), so this is the cheapest honest way
    to vary all three layout axes at once: a prime shuffle partition
    count, tiny scan splits (different map-side partial boundaries),
    and AQE off (no runtime coalescing — the driver's session may
    plan either way)."""
    s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "5")
    s.conf.set("spark.sql.files.maxPartitionBytes", "262144")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    return s


#: never-driver-verified queries plus the current rotation's targets —
#: the queries whose next driver row is their FIRST; a layout-dependent
#: result would fail that one shot
_AT_RISK = sorted(PENDING_FIRST_DRIVER_ROW | CURRENT_ROTATION_TARGETS)


@pytest.mark.parametrize("name", _AT_RISK)
def test_pending_query_is_partition_count_invariant(
    name, spark, perturbed, sf_dir
):
    specs = registry.load_all()
    fn = specs[name].fn
    base = _rows(spark, fn, sf_dir)
    assert _rows(perturbed, fn, sf_dir) == base
