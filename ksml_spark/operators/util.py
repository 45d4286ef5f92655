"""Shared physical-plan helpers for operator implementations."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition a batch DataFrame when its source has fewer
    files than the configured shuffle parallelism.

    A small parquet file scans as one split, so compute-heavy per-row work
    (quadratic broadcast-join pair generation, per-row fold expressions)
    would run in a single task while the other cores idle; spreading one
    split's rows is a trivial shuffle. At scale the condition never fires
    (a 100 TB scan already has thousands of files) so no extra exchange is
    added to the real plan.

    The check counts source FILES (df.inputFiles() — a logical-plan walk,
    ~10ms) rather than scan partitions: df.rdd.getNumPartitions() would
    finalize the physical plan and, under AQE, run a real job (~1.3s)
    just to ask the question."""
    if df.isStreaming:  # micro-batch parallelism is the source's concern
        return df
    nparts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    try:
        nfiles = len(df.inputFiles())
    except Exception:
        return df
    if 0 < nfiles < nparts:
        return df.repartition(nparts)
    return df
