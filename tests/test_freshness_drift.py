"""changed-since-green detection in scripts/freshness_audit.py.

The section exists because a green driver row only certifies the body
the driver saw; an edit after the row (the round-11 NULL-sentinel
revert) must surface. Pin the git mechanics on the REAL repo history:
the three revert queries are flagged against their r10 rows, and a
query whose defining module is untouched since its green round is not.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import freshness_audit  # noqa: E402

from bigdata_spark_realtime_spark.plans import registry  # noqa: E402


def test_null_revert_queries_flag_until_regated():
    """736a7e6 edited ext_pit/ext_contract AFTER their r10 green rows;
    they must appear until a post-revert round marks them green (the
    R13 window seats them — once CORRECTNESS_r13 lands, `latest` moves
    past the edit and this test's premise goes away, so gate on the
    artifact's presence)."""
    if os.path.exists(os.path.join(REPO, "CORRECTNESS_r13.json")):
        return  # post-revert rows landed; the flag legitimately clears
    latest = {
        "ext_pit_scd2_join": 10,
        "ext_contract_audit": 10,
        "stream_contract_audit": 10,
    }
    drifted = freshness_audit.changed_since_green(REPO, registry, latest)
    assert set(drifted) == set(latest), drifted
    for name, (rnd, path) in drifted.items():
        assert rnd == 10
        assert path.endswith(("ext_pit.py", "ext_contract.py"))


def test_untouched_module_does_not_flag():
    """A query whose defining file has no commits after its green round
    must not be flagged — pick one green in the LATEST round (nothing
    can postdate it except this round's in-flight edits, which for
    ext_nullprobe.py there are none)."""
    import glob
    import json
    import re

    rounds = sorted(
        int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    )
    newest = rounds[-1]
    latest = {"ext_null_hash_probe": newest}
    drifted = freshness_audit.changed_since_green(REPO, registry, latest)
    assert drifted == {}, drifted


def test_unknown_round_or_query_is_skipped_not_fatal():
    drifted = freshness_audit.changed_since_green(
        REPO, registry, {"ext_null_hash_probe": 999, "not_a_query": 5}
    )
    assert drifted == {}
