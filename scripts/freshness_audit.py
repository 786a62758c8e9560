"""Driver-row freshness audit: per registered query, the latest round
with a green external-gate row (hash-green, or rows-only for declared
``oracle=None`` queries).

Rotation planning input: once PENDING_FIRST_DRIVER_ROW hits zero (R12),
every window becomes a refresh rotation and the head should chase the
smallest `latest` values here — no green row should age past ~5 rounds
(round-10 judge task #6). Run per round:

    python scripts/freshness_audit.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from bigdata_spark_realtime_spark.plans import registry

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for name, row in json.load(open(p)).items():
            if row.get("hash_match") or row.get("err") == "no_oracle":
                latest[name] = max(latest.get(name, 0), rnd)

    names = list(registry.load_all())
    newest = max(latest.values(), default=0)
    ages = Counter(latest.get(n, 0) for n in names)
    print("queries by latest green round (0 = never):",
          dict(sorted(ages.items())))
    never = sorted(n for n in names if n not in latest)
    if never:
        print(f"{len(never)} never verified (rotation targets, tracked by "
              f"PENDING_FIRST_DRIVER_ROW / the in-flight window): "
              f"{', '.join(never[:8])}{' …' if len(never) > 8 else ''}")
    stale = sorted(
        (latest[n], n) for n in names if n in latest and latest[n] < newest - 4
    )
    print(f"{len(stale)} rows older than r{newest - 4} (refresh candidates):")
    for r, n in stale:
        print(f"  r{r} {n}")

    drifted = changed_since_green(repo, registry, latest)
    print(f"{len(drifted)} changed-since-green (defining module edited "
          f"AFTER the query's latest green driver row — its green row no "
          f"longer certifies the current body; seat these in the next "
          f"refresh window):")
    for n, (r, f) in sorted(drifted.items()):
        print(f"  r{r} {n} ({f})")
    return 0


def changed_since_green(
    repo: str, registry, latest: dict[str, int]
) -> dict[str, tuple[int, str]]:
    """Queries whose DEFINING plan-module file has git changes after the
    commit that recorded their latest green driver row (the round-11
    judge's blind spot: the NULL-sentinel revert changed three query
    bodies post-row and the audit still called them 'pass r10').

    The anchor commit for round N is the commit that ADDED
    CORRECTNESS_r{N}.json — the driver verified the tree as of its
    parent, and those round-snapshot commits touch artifacts only.
    Scope is the fn's defining module file; a drifted shared helper
    is caught by that helper's own callers' tests, not here."""
    import subprocess

    def _git(*args: str) -> str:
        return subprocess.run(
            ["git", *args], cwd=repo, capture_output=True, text=True, check=True
        ).stdout.strip()

    specs = registry.load_all()
    anchors: dict[int, str] = {}
    for rnd in set(latest.values()):
        out = _git(
            "log", "--diff-filter=A", "--format=%H", "--",
            f"CORRECTNESS_r{rnd:02d}.json",
        )
        if out:
            anchors[rnd] = out.splitlines()[-1]  # oldest add

    # group queries by (defining file, green round): one git call per pair
    import importlib

    by_pair: dict[tuple[str, int], list[str]] = {}
    for name, rnd in latest.items():
        if name not in specs or rnd not in anchors:
            continue
        mod = importlib.import_module(specs[name].fn.__module__)
        f = os.path.relpath(mod.__file__, repo)
        by_pair.setdefault((f, rnd), []).append(name)

    # uncommitted working-tree/staged edits drift too (round-12
    # advisor: committed history alone under-reports exactly when the
    # audit runs mid-round, before the edit is committed); staged
    # renames list "R  old -> new" — both sides count as dirty
    dirty: set[str] = set()
    for ln in _git("status", "--porcelain").splitlines():
        if ln.strip():
            dirty.update(p.strip() for p in ln[3:].split(" -> "))

    drifted: dict[str, tuple[int, str]] = {}
    for (f, rnd), qnames in by_pair.items():
        if f in dirty or _git("log", "--format=%h", f"{anchors[rnd]}..HEAD", "--", f):
            for n in qnames:
                drifted[n] = (rnd, f)
    return drifted


if __name__ == "__main__":
    raise SystemExit(main())
