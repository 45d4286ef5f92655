"""Per-round benchmark: runs the full __spark_entry__ query suite at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "suite_seconds", "value": <total>, "unit": "sec",
     "queries": {...per-query seconds...}, "sf": 0.1}

Each query is executed with the no-op sink (format("noop")) so the measured
cost is the full distributed plan — scan, shuffles, Python stages — without
driver-collect serialization noise. Tables are warmed (page cache + session
init) before timing.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from ksml_spark import get_spark  # noqa: E402
from ksml_spark.sources.files import TABLE_NAMES, load_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="ksml-spark-bench")
    # warm-up: session init, file listing, page cache, Python workers; untimed
    for t in TABLE_NAMES:
        try:
            load_table(spark, sf_dir, t).write.mode("overwrite").format("noop").save()
        except Exception:
            pass
    warm = spark.range(256).repartition(32)
    warm.mapInPandas(lambda it: it, "id long").write.mode("overwrite").format("noop").save()

    # multiple passes, per-query min: the container's virtualized CPU makes
    # first-execution JIT cost noisy, and external load on the shared host
    # can inflate a whole pass (observed 1.7x) — min-of-3 measures the
    # steady state
    passes = int(os.environ.get("BENCH_PASSES", "3"))
    per_query: dict[str, float] = {}
    for _ in range(passes):
        for name, fn in entrymod.queries().items():
            t0 = time.time()
            try:
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                dt = time.time() - t0
            except Exception as e:
                print(f"bench error in {name}: {type(e).__name__}: {e}", file=sys.stderr)
                dt = float("nan")
            prev = per_query.get(name)
            per_query[name] = round(min(dt, prev) if prev is not None and prev == prev else dt, 3)
    total = sum(v for v in per_query.values() if v == v)

    print(json.dumps({
        "metric": "suite_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
