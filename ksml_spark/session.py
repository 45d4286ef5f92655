"""SparkSession factory with scale-aware defaults.

Single place for the engine's Spark configuration posture:

* **AQE on** — runtime re-planning (partition coalescing, skew-join
  splitting, dynamic broadcast) is the first line of defense at 100 TB.
* **UTC session timezone** — deterministic timestamp semantics across
  engines (the DuckDB oracle compares naive/UTC timestamps).
* **Arrow on** — pandas UDF / toPandas paths are Arrow-batched.
* shuffle.partitions defaults to 32 locally; on a real cluster set it
  ~2-3x total executor cores or rely on AQE coalescing from a higher
  initial value.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession


def _env_cpus(default: int = 32) -> int:
    """$SPARK_GRAFT_CPUS as an int, tolerating junk values (ADVICE r17:
    this is read at module import, so a non-numeric value — 'auto',
    '8 cores' — must degrade to the default, not crash every import of
    ksml_spark with an uncurated ValueError)."""
    raw = os.environ.get("SPARK_GRAFT_CPUS")
    try:
        return int(raw) if raw else default
    except (TypeError, ValueError):
        return default


DEFAULT_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # generous broadcast threshold: all dims in the star schema are small
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # shuffle width follows the configured core count (SPARK_GRAFT_CPUS)
    # instead of a constant tuned for local[32]: the bench harness runs
    # at more than one core count, and on a real cluster this is the
    # knob to set ~2-3x total executor cores (or leave higher and let
    # AQE coalesce). Floor of 8 keeps toy sessions from degenerating.
    "spark.sql.shuffle.partitions": str(max(_env_cpus(), 8)),
    "spark.ui.enabled": "false",
    # local[32] runs driver + all executor threads in ONE heap: broadcasts,
    # shuffle buffers, and codegen classes for a 50-query suite accumulate,
    # and an 8g heap measurably GC-thrashes mid-suite (the same queries run
    # ~2x slower late in a session than in isolation; 24g removes it).
    # On a real cluster executors have their own heaps — size accordingly.
    "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
    # This container's virtualized CPU makes HotSpot C2 compilation
    # pathologically slow (~60s one-time stall on the first regex/explode
    # query shape). C1-only JIT compiles instantly and is within a few
    # percent at these scales; on a real cluster, drop this override.
    # The large ReservedCodeCacheSize matters with C1-only: every
    # whole-stage-codegen class stays compiled; at the 48 MB default the
    # cache fills after ~30 generated plans and the JIT silently disables,
    # leaving everything interpreted (~10x slowdown).
    "spark.driver.extraJavaOptions": "-XX:TieredStopAtLevel=1 -XX:ReservedCodeCacheSize=512m",
    "spark.executor.extraJavaOptions": "-XX:TieredStopAtLevel=1 -XX:ReservedCodeCacheSize=512m",
    # Janino-compiled codegen classes live in a driver-side cache of
    # only 100 entries by default; a 100-query suite (several codegen
    # units each) evicts everything every pass, so compile-heavy plans
    # (wide filter trees, 64-dim unrolled dot chains, the KN join tree)
    # re-pay full Janino compilation per invocation — measured: the
    # expression-only gopher_filter reads ~0.5s isolated but ~2.5s
    # inside the full suite until this cache is sized to hold the
    # working set. Static conf: must be set before the first session.
    "spark.sql.codegen.cache.maxEntries": "2000",
}


def get_spark(
    app_name: str = "ksml-spark",
    master: Optional[str] = None,
    conf: Optional[dict] = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        try:
            master = f"local[{int(cpus)}]" if cpus else "local[*]"
        except (TypeError, ValueError):
            master = "local[*]"  # junk $SPARK_GRAFT_CPUS: all cores
    b = SparkSession.builder.appName(app_name).master(master)
    merged = dict(DEFAULT_CONF)
    if conf:
        merged.update(conf)
    for k, v in merged.items():
        b = b.config(k, v)
    return b.getOrCreate()
