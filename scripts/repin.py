"""Isolated re-pin measurement batch (VERDICT r14 #1).

For each named registry query (default: scripts/pin_check.py's
stale-epoch list), measures the r10 pin methodology in one session:
isolated (no other suite queries interleaved), noop-write, one untimed
warm pass then min-of-warm-4 — with ``spark.catalog.clearCache()``
before every timed pass so a query that persists internal relations
pays its honest fresh-relation cost per invocation (the r14
pmi_collocations precedent: a cached-subtree min-of-warm under-read the
suite cost 3.5x). Also measures bench.py's constant-work calibration
row so the batch carries its own host-speed reference.

Usage: python scripts/repin.py [query ...]
Prints one JSON object {calib: s, queries: {name: s}} — paste into
docs/PERF_BASELINE.md with an epoch note.
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import __spark_entry__ as entrymod  # noqa: E402
from bench import _calibration_py_seconds, _calibration_seconds  # noqa: E402
from ksml_spark import get_spark  # noqa: E402
from ksml_spark.sources.files import TABLE_NAMES, load_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    if not names:
        sys.path.insert(0, os.path.join(HERE, "scripts"))
        from pin_check import load_pins

        _, names, _, _ = load_pins()
        names = sorted(names)

    spark = get_spark(app_name="ksml-spark-repin")
    for t in TABLE_NAMES:
        try:
            load_table(spark, sf_dir, t).write.mode("overwrite").format("noop").save()
        except Exception:
            pass
    spark.range(256).repartition(32).mapInPandas(
        lambda it: it, "id long").write.mode("overwrite").format("noop").save()
    calib = _calibration_seconds(spark)
    calib_py = _calibration_py_seconds(spark)

    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"repin: unknown query {name!r}", file=sys.stderr)
            continue
        try:
            # one untimed warm (JIT + page cache + Python workers)
            spark.catalog.clearCache()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = float("inf")
            for _ in range(4):
                spark.catalog.clearCache()
                t0 = time.time()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                best = min(best, time.time() - t0)
            out[name] = round(best, 3)
            print(f"  {name}: {out[name]}", file=sys.stderr)
        except Exception as e:
            print(f"repin error in {name}: {type(e).__name__}: {e}",
                  file=sys.stderr)
    print(json.dumps({"calib": calib, "calib_py": calib_py,
                      "sf_dir": sf_dir, "queries": out},
                     indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
