"""Per-query optimization probe (round-15 tooling).

Times individual registered queries in isolation — same methodology as
bench.py (noop sink so every column of every row is computed, warm-up
pass at sf0.001 for codegen/JIT, min across passes) — and optionally
dumps ``explain('formatted')`` per query, so a change's plan-shape
effect (Exchange count, join strategy, PushedFilters, *EvalPython
nodes) is reviewable as a file diff.

Usage::

    python scripts/perf_probe.py q1_pricing_summary ext_bm25_search
    PROBE_PASSES=3 python scripts/perf_probe.py --explain-dir plans/r15 \
        --suffix _before ext_split_leakage

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), PROBE_PASSES
(default 3). Prints one line per query: name, min, all pass times.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")


def main() -> int:
    args = sys.argv[1:]
    explain_dir = None
    suffix = ""
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--explain-dir":
            explain_dir = args[i + 1]
            i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    from bigdata_spark_realtime_spark.plans import registry
    from bigdata_spark_realtime_spark.session import get_spark

    spark = get_spark(app_name="bsr-perf-probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.load_all()
    unknown = [n for n in names if n not in specs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    if not names:
        names = sorted(specs)

    n_passes = int(os.environ.get("PROBE_PASSES", "3"))

    # warm the parquet footer cache + JVM codegen exactly like bench.py
    from bigdata_spark_realtime_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        try:
            load_table(spark, SF_DIR, t).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    for name in names:
        try:
            specs[name].fn(spark, WARM_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001
            print(f"warm-up failed {name}: {e!r}"[:300], file=sys.stderr)

    if explain_dir:
        os.makedirs(explain_dir, exist_ok=True)
        import contextlib
        import io

        for name in names:
            df = specs[name].fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
            path = os.path.join(explain_dir, f"{name}{suffix}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"explain -> {path}")

    results = {}
    if n_passes <= 0:  # explain-only invocation
        spark.stop()
        return 0
    for name in names:
        times = []
        for _ in range(n_passes):
            spark.sparkContext.setJobDescription(f"probe: {name}")
            t0 = time.perf_counter()
            specs[name].fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = times
        print(f"{name:35s} min={min(times):7.3f}  passes={times}")
    total = sum(min(t) for t in results.values())
    print(f"TOTAL (sum of mins) = {total:.3f} s over {len(results)} queries")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
