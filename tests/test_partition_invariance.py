"""Partition-invariance contract: every registry query's VALUES are
identical under a radically different physical layout (7 shuffle
partitions + 1M scan splits vs the tuned 32/128M, AQE on in both).

This is the claim the 100 TB posture rests on: a 1000-executor cluster
runs a different partition count, different split sizes, and different
AQE coalescing than the test box — a query whose result moves with any
of those (unordered LIMIT, first()/any_value, float partial-sum
ordering the data does not protect, pandas-UDF batch-boundary
dependence) is silently irreproducible at scale. The sweep, the layout
variant, and the cache-clearing discipline live in
scripts/partition_probe.py (one source of truth — this test imports it,
the empty_sweep pattern). Full-registry runs at sf0.001 here (suite
budget); the per-round evidence run is sf0.01, the driver's
correctness SF.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


@pytest.mark.slow
def test_registry_partition_invariance(spark):
    import partition_probe

    diverged, errors = partition_probe.sweep(
        spark, "/root/testdata/sf0.001", verbose=False
    )
    assert not errors, f"layout-dependent failures: {errors}"
    assert not diverged, f"partition-dependent values: {diverged}"
