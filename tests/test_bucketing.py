"""Bucketed co-located join: plan shape + reuse semantics.

The oracle gate (test_queries_oracle) already proves the bucketed join
returns the same rows as the plain join; these tests pin the property
bucketing exists FOR — no Exchange below the join — and the
write-once/reuse contract.
"""

from bigdata_spark_realtime_spark.sources.bucketing import (
    bucketed_table_name,
    colocated_order_join,
    materialize_bucketed,
)


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    joined = colocated_order_join(spark, sf_dir)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # bucketed scans: both sides select all their buckets
    assert plan.count("SelectedBucketsCount") == 2, plan


def test_materialize_is_idempotent(spark, sf_dir):
    a = materialize_bucketed(spark, sf_dir, "orders")
    n_rows = a.count()
    # second call must reuse the catalog entry, not rewrite
    b = materialize_bucketed(spark, sf_dir, "orders")
    assert b.count() == n_rows
    name = bucketed_table_name(sf_dir, "orders", 8)
    assert spark.catalog.tableExists(name)


def test_reregister_after_catalog_loss(spark, sf_dir):
    name = bucketed_table_name(sf_dir, "lineitem", 8)
    materialize_bucketed(spark, sf_dir, "lineitem")
    n_rows = spark.table(name).count()
    # simulate a fresh session's empty in-memory catalog: drop the table
    # (external → files survive), re-materialize re-registers over the
    # same files without rewriting
    spark.sql(f"DROP TABLE {name}")
    import os
    from bigdata_spark_realtime_spark.sources.bucketing import DEFAULT_ROOT

    path = os.path.join(DEFAULT_ROOT, name)
    mtime = os.path.getmtime(os.path.join(path, "_SUCCESS"))
    df = materialize_bucketed(spark, sf_dir, "lineitem")
    assert df.count() == n_rows
    assert os.path.getmtime(os.path.join(path, "_SUCCESS")) == mtime
