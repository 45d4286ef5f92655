"""NULL-injection oracle contract: the full DuckDB gate stays green on
a null-laden copy of the testdata.

At 100 TB a NULL-laden value column is a normal state (failed upstream
parses, optional fields, late enrichment) — the driver testdata has no
NULLs anywhere, so before r15 the registry's NULL behavior was only
unit-tested. The sweep found one real engine bug (the stateful fold's
unguarded ``astype("int64")`` turned NaN cents into INT64_MIN garbage
whose ledger sum overflowed int64 — silent-wrong, then an opaque Arrow
abort) and three oracle expressions that degraded NULL instead of
propagating it (DuckDB ``concat`` skips NULLs where Spark's propagates;
fingerprint/entropy coalesced NULL text to 0). The injection layout,
the key/array-column exclusions and their reasons, and the copy's
timestamp-annotation note all live in scripts/null_sweep.py; the
compare is check_oracle's single implementation (one source of truth).
Full-registry at sf0.001 here (suite budget); the per-round evidence
run is sf0.01.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


def test_registry_null_injection_oracle_gate(spark, tmp_path_factory):
    import null_sweep
    from check_oracle import run_gate

    d = null_sweep.build_nulled_dir(
        spark, "/root/testdata/sf0.001",
        str(tmp_path_factory.mktemp("nulled_sf"))
    )
    failures = run_gate(spark, d)
    assert not failures, f"oracle gate failures on null-injected data: {failures}"


def test_registry_null_fk_oracle_gate(spark, tmp_path_factory):
    """The --keys variant: NULL FOREIGN keys (unknown user, unmatched
    enrichment — the realistic dirty-join class) flow SQL-consistently
    through every group/join/window path: a NULL group key groups, a
    NULL join key never matches, on BOTH engines identically. Went
    green on its first r15 run — zero adjudication needed."""
    import null_sweep
    from check_oracle import run_gate

    d = null_sweep.build_nulled_dir(
        spark, "/root/testdata/sf0.001",
        str(tmp_path_factory.mktemp("nulled_fk_sf")), keys=True
    )
    failures = run_gate(spark, d)
    assert not failures, f"oracle gate failures on null-FK data: {failures}"
