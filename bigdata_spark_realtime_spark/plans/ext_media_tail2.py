"""Tail-registration shim for round-8 media additions.

plans/ext_media_tail.py — the round-6 shim this mirrors — is itself
part of the pinned ROUND-8 gate window now (registry._PLAN_MODULES), so
registering new queries from it would splice them into the first-50
window and silently evict its tail. This module registers from a
position after the window instead; fold the registration back when the
round-9 rotation rebuilds the window.
"""

from __future__ import annotations

from bigdata_spark_realtime_spark.plans import ext_multimodal as mm
from bigdata_spark_realtime_spark.plans.registry import register

# image near-dup pairs by 64-bit perceptual hash (defined beside its
# siblings in ext_multimodal; real PNG decode in the loop)
register("ext_multimodal_phash_pairs", oracle=mm.PHASH_ORACLE)(
    mm.ext_multimodal_phash_pairs
)

# audio near-dup pairs by 64-bit PCM energy signature (same machinery)
register("ext_multimodal_audiohash_pairs", oracle=mm.AUDIOHASH_ORACLE)(
    mm.ext_multimodal_audiohash_pairs
)

# video keyframe sampling over MJV containers (real per-frame PNG decode)
register("ext_multimodal_video_frames", oracle=mm.VIDEO_FRAMES_ORACLE)(
    mm.ext_multimodal_video_frames
)

# scene-cut detection over the MJV clips (exact integer luma-mean jumps)
register("ext_multimodal_scene_cuts", oracle=mm.SCENE_CUTS_ORACLE)(
    mm.ext_multimodal_scene_cuts
)
