"""Empty-input contract: every registry query on ZERO-ROW tables either
returns an empty (or summary-shaped) result or refuses curatedly.

At 100 TB an empty partition / date-slice / filter-matched-nothing is a
normal state — an opaque runtime failure on empty input (an eager
collect indexing [0], a div-by-zero on a count, a non-nullable cast fed
by an empty aggregate) is the class this pins. The classification, the
summary-shaped allowlist, and the adjudicated curated-refusal baseline
all live in scripts/empty_sweep.py (one source of truth — this test
imports them, the unicode_probe pattern).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


@pytest.mark.slow
def test_registry_empty_input_contract(spark, tmp_path_factory):
    import empty_sweep

    d = empty_sweep.build_empty_dir(
        spark, str(tmp_path_factory.mktemp("empty_sf"))
    )
    ok, curated, opaque, unexplained = empty_sweep.sweep(spark, d)

    assert not opaque, f"opaque failures on empty input: {opaque}"
    assert not unexplained, f"unexpected rows on empty input: {unexplained}"
    refused = {n for n, _, _ in curated}
    assert refused == empty_sweep.CURATED_ON_EMPTY, (
        "curated-refusal set drifted: "
        f"new={sorted(refused - empty_sweep.CURATED_ON_EMPTY)} "
        f"gone={sorted(empty_sweep.CURATED_ON_EMPTY - refused)}"
    )
