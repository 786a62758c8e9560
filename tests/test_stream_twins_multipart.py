"""Every streaming twin, oracle-exact on a 3-part Spark-WRITTEN
replica (production layout) — the standing per-round promotion of
round 14's one-off verification (commit b660e03).

Round 14 found that table layout is a correctness axis for streaming
replays: a symlinked directory was not recursed by the file-stream
source (silently EMPTY stream), and with one part file per micro-batch
the watermark advanced between parts and the streaming agg silently
dropped 386/477 windows. tests/test_round14_property.py pins three
representative twins; this module runs ALL registered ``stream_*``
queries against the replica and their own DuckDB oracles, so the next
layout-sensitive regression goes red locally instead of surfacing in a
scale smoke.

Also pins the round-15 replay-stamp fixes (r14 advisor findings): the
replay link dir and the flush-sentinel fixture are keyed by a content
stamp of the WHOLE data-file set, so an append (new part files, first
file untouched) or an in-place rewrite (dangling/stale links) always
gets a fresh stream dir.
"""

from __future__ import annotations

import os

import pytest

from bigdata_spark_realtime_spark.plans import registry
from tests.oracle_util import assert_matches_oracle

SPECS = registry.load_all()
STREAM_TWINS = sorted(n for n in SPECS if n.startswith("stream_"))


def test_twin_inventory_is_complete():
    """A renamed twin must not silently drop out of this gate."""
    assert len(STREAM_TWINS) >= 38


@pytest.fixture(scope="module")
def dir_tables(spark, sf_dir, tmp_path_factory):
    """sf0.001 replica where events/documents/embeddings are
    Spark-written 3-part directory tables and dims are symlinks."""
    work = str(tmp_path_factory.mktemp("twin_dir_tables"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(work, f"{t}.parquet")
        if t in ("events", "documents", "embeddings"):
            spark.read.parquet(src).repartition(3).write.parquet(dst)
        else:
            os.symlink(src, dst)
    return work


@pytest.mark.parametrize("name", STREAM_TWINS)
def test_twin_oracle_exact_on_multipart_replica(name, spark, duck, dir_tables):
    """The twin on the 3-part replica must hash-match the same oracle
    the single-file driver gate checks (replica rows are identical, so
    the oracle frame is unchanged)."""
    spec = SPECS[name]
    assert_matches_oracle(spec.fn(spark, dir_tables), duck, spec.oracle)


def _drain(spark, df, view: str) -> int:
    q = (
        df.writeStream.format("memory")
        .queryName(view)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql(f"SELECT count(*) c FROM {view}").collect()[0][0]
    q.stop()
    return n


def test_replay_dir_is_content_stamped_across_append_and_rewrite(
    spark, sf_dir, tmp_path
):
    """r14 advisor findings: appending part files (first file untouched)
    must not reuse a stale link dir, and an in-place rewrite must not
    leave dangling or stale-version links."""
    from bigdata_spark_realtime_spark.sources.replay import (
        file_replay_stream,
        table_stamp,
    )

    tbl = str(tmp_path / "events.parquet")
    src = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    src.limit(100).repartition(3).write.parquet(tbl)
    s1 = table_stamp(tbl)
    assert _drain(spark, file_replay_stream(spark, tbl), "t_replay_a") == 100

    # append: two NEW part files, existing ones untouched
    src.limit(150).subtract(src.limit(100)).repartition(2).write.mode(
        "append"
    ).parquet(tbl)
    assert table_stamp(tbl) != s1
    assert _drain(spark, file_replay_stream(spark, tbl), "t_replay_b") == 150

    # in-place rewrite: fewer rows, different part names — a path-keyed
    # dir would now hold dangling links (listing crash) or links to the
    # previous version (old rows mixed in)
    src.limit(40).repartition(2).write.mode("overwrite").parquet(tbl)
    assert _drain(spark, file_replay_stream(spark, tbl), "t_replay_c") == 40


def test_flush_sentinel_refreshes_on_append(spark, sf_dir, tmp_path):
    """stream_windowed_counts' sentinel carries max(ts)+10y; an append
    with later timestamps must regenerate it (the first-file-only stamp
    reused the old sentinel and the watermark dropped every appended
    row — the exact silent-late-drop class the r14 fix addressed)."""
    from bigdata_spark_realtime_spark.plans.streaming_queries import (
        stream_windowed_counts,
    )

    work = str(tmp_path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).orderBy(
        "ts"
    )
    n = ev.count()
    first, second = ev.limit(n // 2), ev.subtract(ev.limit(n // 2))
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        os.symlink(
            os.path.join(sf_dir, f"{t}.parquet"),
            os.path.join(work, f"{t}.parquet"),
        )
    tbl = os.path.join(work, "events.parquet")
    first.write.parquet(tbl)
    rows_half = stream_windowed_counts(spark, work).collect()
    # append the LATER half — every appended row is past the old
    # sentinel's watermark if the sentinel is stale
    second.write.mode("append").parquet(tbl)
    got = sum(r["ct"] for r in stream_windowed_counts(spark, work).collect())
    assert got == n, f"appended rows lost: {got} != {n}"
    assert sum(r["ct"] for r in rows_half) == n // 2
