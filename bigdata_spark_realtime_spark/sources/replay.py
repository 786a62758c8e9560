"""Layout-robust file-replay streams for batch parquet tables.

The streaming twins replay a batch parquet table through Spark's
file-stream source, which requires a *directory* of data files. The
older per-module replay helpers (``plans/streaming_queries.py``)
symlink the table path itself into a temp dir — correct for the
single-file tables the driver testdata ships, but a Spark-WRITTEN
table is a directory of part files, and a symlinked directory is not
recursed by the file-stream source: the stream comes up EMPTY and
every downstream aggregate silently reports zero rows (measured in
round 13 on the 10x/30x scale-smoke replicas — the worst failure mode,
fast and wrong). This helper handles both layouts: a file is linked
directly, a directory gets each of its data files linked (skipping
``_SUCCESS``/hidden entries), so the replay works unchanged on the
production-shaped layout. The round-14+ plan migrates the older
helpers here at their next natural re-gate.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


def _is_data_file(name: str) -> bool:
    return not name.startswith(("_", ".")) and name.endswith(".parquet")


def file_replay_stream(
    spark: SparkSession,
    table_path: str,
    schema=None,
) -> DataFrame:
    """Replay ``table_path`` (a parquet file OR a Spark-written parquet
    directory) as a file-source stream. The link dir is keyed by the
    absolute source path so two tables sharing a basename never reuse
    each other's links; links are idempotent across sessions."""
    path = os.path.abspath(table_path)
    if schema is None:
        schema = spark.read.parquet(path).schema
    stream_dir = os.path.join(
        tempfile.gettempdir(),
        f"bsr_replay_{hashlib.md5(path.encode()).hexdigest()[:12]}",
    )
    os.makedirs(stream_dir, exist_ok=True)
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            if _is_data_file(f):
                link = os.path.join(stream_dir, f)
                if not os.path.exists(link):
                    os.symlink(os.path.join(path, f), link)
    else:
        link = os.path.join(stream_dir, os.path.basename(path))
        if not os.path.exists(link):
            os.symlink(path, link)
    return spark.readStream.schema(schema).parquet(stream_dir)
