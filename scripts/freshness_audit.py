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
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
