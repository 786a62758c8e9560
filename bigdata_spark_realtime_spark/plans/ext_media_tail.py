"""Registration shim for the round-6 multimodal additions.

The frame-sampling and resize queries live beside their siblings in
plans/ext_multimodal.py, but that module is part of the PINNED round-6
gate window (registry._PLAN_MODULES): decorating them there would
splice two new queries into the middle of the first-50 window and
silently evict its last two entries from the external gate. This
module registers them from a position after the window instead; fold
the registrations back into ext_multimodal when the round-7 rotation
rebuilds the window anyway.
"""

from __future__ import annotations

from bigdata_spark_realtime_spark.plans import ext_multimodal as mm
from bigdata_spark_realtime_spark.plans.registry import register

register("ext_multimodal_frames", oracle=mm.FRAMES_ORACLE)(
    mm.ext_multimodal_frames
)
# oracle-gated since round 8: the gate hashes the DECODED resized
# pixels against the generator's resample of the pre-encode arrays
register("ext_multimodal_resize", oracle=mm.RESIZE_ORACLE)(
    mm.ext_multimodal_resize
)
# NOTE: round-8's ext_multimodal_phash_pairs registers from
# plans/ext_media_tail2.py — THIS module now sits inside the pinned
# round-8 window, so registering it here would splice into the window
# and evict its tail (the hazard tests/test_registry.py pins against).
