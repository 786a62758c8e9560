"""Tail-registration shim for round-9 funnel additions.

plans/ext_funnel.py is part of the pinned ROUND-9 gate window
(registry._PLAN_MODULES), so registering new queries from it would
splice them into the first-50 window and silently evict its tail. This
module registers from a position after the window instead; fold the
registration back when a future rotation rebuilds the window.
"""

from __future__ import annotations

from bigdata_spark_realtime_spark.plans import ext_funnel as fnl
from bigdata_spark_realtime_spark.plans.registry import register

# day-bounded event-transition census (defined beside its base variant
# in ext_funnel; composite (user_id, day) window partition key)
register(
    "ext_event_transitions_daily", oracle=fnl.TRANSITIONS_DAILY_ORACLE
)(fnl.ext_event_transitions_daily)

# step-over-step conversion rates on the funnel frame (defined beside
# the funnel in ext_funnel)
register("ext_funnel_conversion", oracle=fnl.CONVERSION_ORACLE)(
    fnl.ext_funnel_conversion
)
