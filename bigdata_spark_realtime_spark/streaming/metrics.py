"""Operational metrics — SURVEY.md §2.7 A7 / §2.2 K8.

The reference sprinkles driver-side `rdd.count()` calls and
`DStream.print` taps for batch-size logging (`app/dwd_DauApp.scala:71,
77-82,89,108`) — each one an extra job over the data. The Spark twin is
``df.observe``: metrics are accumulated inside the existing job (zero
extra passes) and surfaced per micro-batch through a
StreamingQueryListener.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def with_batch_counts(df: DataFrame, name: str = "stats") -> DataFrame:
    """A7: row count (and null-key count example) observed in-flight."""
    return df.observe(name, F.count(F.lit(1)).alias("rows"))


class BatchMetrics(StreamingQueryListener):
    """Collects observed metrics per micro-batch (K8's per-batch count
    logs, without the extra count() jobs). ``metrics`` maps
    observation-name → list of per-batch dicts."""

    def __init__(self) -> None:
        self.metrics: dict[str, list[dict]] = {}

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        observed = event.progress.observedMetrics
        for name, row in observed.items():
            self.metrics.setdefault(name, []).append(row.asDict())

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
