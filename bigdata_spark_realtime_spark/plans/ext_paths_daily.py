"""Head-registration shim: seat ``ext_session_paths_daily`` in the r11
gate window.

plans/ext_paths.py registers its two queries from INSIDE the pinned
r11 window region (ext_stream_tail3 drags it forward), so adding a
``register()`` call there would shift every later slot. This module
instead sits explicitly in registry._PLAN_MODULES' head, right before
sort_limit, so the daily variant lands at window slot 48 and gets its
first driver row in the same round it ships (round-10 judge task #7) —
displacing sort_limit's third r7-era refresh (l4_field_fetch_cap),
which re-seats in a later rotation.
"""

from __future__ import annotations

from bigdata_spark_realtime_spark.plans import ext_paths as paths
from bigdata_spark_realtime_spark.plans.registry import register

# day-bounded session-path census (defined beside its base variant in
# ext_paths; composite (user_id, day) window partition key)
register(
    "ext_session_paths_daily", oracle=paths.SESSION_PATHS_DAILY_ORACLE
)(paths.ext_session_paths_daily)
