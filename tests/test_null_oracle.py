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

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


@pytest.mark.slow
def test_registry_null_injection_oracle_gate(spark, tmp_path_factory):
    import null_sweep
    from check_oracle import run_gate

    d = null_sweep.build_nulled_dir(
        spark, "/root/testdata/sf0.001",
        str(tmp_path_factory.mktemp("nulled_sf"))
    )
    failures = run_gate(spark, d)
    assert not failures, f"oracle gate failures on null-injected data: {failures}"


@pytest.mark.slow
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


def test_stateful_fold_all_null_user_matches_sql_sum(spark, tmp_path):
    """ADVICE r15 (medium): a user whose EVERY value is NULL must fold
    total_cents to SQL-NULL (SUM over an all-NULL group), not Python
    sum([]) == 0. The driver SFs never produce such a user (~(1/17)^k
    per user under the sweep's injection), so this pins the case the
    sweep can't reach: Spark fold vs DuckDB oracle on a planted
    all-NULL user, hash-exact via the one norm_cell implementation."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as entrymod
    from check_oracle import norm_cell

    ts = pa.array([1704067200000000 + i * 60_000_000 for i in range(6)],
                  type=pa.timestamp("us"))
    tbl = pa.table({
        "event_id": pa.array(range(6), type=pa.int64()),
        "ts": ts,
        "user_id": pa.array([1, 1, 1, 2, 2, 2], type=pa.int64()),
        "event_type": pa.array(["click", "view", None, "click", "click", "buy"]),
        # user 1: all values NULL; user 2: mixed NULL/non-NULL
        "value": pa.array([None, None, None, 1.25, None, 3.5], type=pa.float64()),
        "props": pa.array(["{}"] * 6),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    df = entrymod._q_transform_with_state(spark, str(tmp_path))
    got = {tuple(norm_cell(v) for v in sorted(r.asDict().items()))
           for r in df.collect()}

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
    orc = con.sql(entrymod._QUERIES["transform_with_state_fold"][1])
    cols = [d[0] for d in orc.description]
    want = {tuple(norm_cell(v) for v in sorted(zip(cols, row)))
            for row in orc.fetchall()}
    assert got == want
    # and the planted case really is exercised: user 1's sum is NULL
    u1 = {r["user_id"]: r["total_cents"] for r in df.collect()}
    assert u1[1] is None and u1[2] == 475
