"""The committed next-round rotation plan must stay executable.

plans/ROTATION_R{N}.md precomputes the next gate window under a
module-head reorder. Its slot math goes stale the moment any plan
module gains/loses a registration or a module-level import — rounds 7
and 11 both hit stale-plan hazards (a silently skipped rotation; a
drag warning obsoleted by a refactor). This test re-simulates the
plan's head in a fresh interpreter against the CURRENT registry and
compares with the window pasted in the plan file, turning "SIMULATE
before pasting" from discipline into a local red."""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLAN_GLOB = re.compile(r"ROTATION_R(\d+)\.md$")
PLANS_DIR = os.path.join(REPO, "bigdata_spark_realtime_spark", "plans")


def _find_plan():
    for f in sorted(os.listdir(PLANS_DIR)):
        m = PLAN_GLOB.search(f)
        if m:
            return os.path.join(PLANS_DIR, f), int(m.group(1))
    return None, None


def _parse_plan(text: str):
    """Extract the head module list and the R{N}_WINDOW literal."""
    m = re.search(r"```\n([a-z0-9_,\s]+?)\n```", text)
    assert m, "plan file lacks the head-module code block"
    head = [x.strip() for x in m.group(1).replace("\n", " ").split(",") if x.strip()]
    w = re.search(r"R\d+_WINDOW = (\[.*?\])", text, re.S)
    assert w, "plan file lacks the R{N}_WINDOW literal"
    # the literal is python list syntax with double-quoted strings —
    # json-compatible after stripping the trailing comma
    window = json.loads(re.sub(r",\s*\]", "]", w.group(1)))
    return head, window


def test_committed_rotation_plan_matches_fresh_simulation():
    plan_path, n = _find_plan()
    if plan_path is None:
        pytest.skip("no pending rotation plan (rotation just executed)")
    head, window = _parse_plan(open(plan_path).read())
    assert len(window) == 50, f"plan window must be exactly 50, got {len(window)}"

    sim = (
        "import json\n"
        "from bigdata_spark_realtime_spark.plans import registry\n"
        f"head = {head!r}\n"
        "pref = 'bigdata_spark_realtime_spark.plans.'\n"
        "full = [pref + m for m in head]\n"
        "missing = [m for m in full if m not in registry._PLAN_MODULES]\n"
        "assert not missing, f'plan names unknown modules: {missing}'\n"
        "rest = [m for m in registry._PLAN_MODULES if m not in full]\n"
        "registry._PLAN_MODULES = tuple(full + rest)\n"
        "print(json.dumps(list(registry.load_all())[:50]))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", sim],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got == window, (
        f"ROTATION_R{n:02d}.md is stale — the simulated window no longer "
        f"matches the plan (a module registration or import changed since "
        f"it was written); re-simulate and update the plan file.\n"
        f"first divergence: "
        f"{next(((i, a, b) for i, (a, b) in enumerate(zip(got, window)) if a != b), None)}"
    )
