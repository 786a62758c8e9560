"""Tail-registration shim for round-9 sampling additions.

plans/ext_sampling.py is dragged into the PLANNED round-10 gate window
(ROTATION_R10.md: streaming_queries imports it inside the head), so
registering new queries from it would splice that window. This module
registers from the end of the walk instead; fold the registration back
when a rotation deliberately windows it.
"""

from __future__ import annotations

from bigdata_spark_realtime_spark.plans import ext_sampling as smp
from bigdata_spark_realtime_spark.plans.registry import register

# fixed-size deterministic hash sample (defined beside its rate-based
# siblings in ext_sampling)
register("ext_sample_topk_hash", oracle=smp.TOPK_HASH_ORACLE)(
    smp.ext_sample_topk_hash
)
