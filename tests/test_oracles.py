"""Static checks over the driver-facing query registry in
__spark_entry__.py — no Spark session needed.

The correctness driver compares Spark results to the DuckDB oracles
through a pandas/arrow fetch, where DuckDB's 128-bit types silently
coerce: an integer ``SUM`` returns HUGEINT, which lands in pandas as
float64 ("123.0" vs Spark's "123" — a guaranteed value-hash mismatch
even when every value is equal). This pinned the round-4 regressions on
``corpus_prep`` and ``repetition_scores``; every oracle's result schema
must stay free of HUGEINT/UHUGEINT/DECIMAL.
"""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    import os

    if not os.path.isdir(SF_DIR):
        pytest.skip("testdata not present")
    import __spark_entry__  # noqa: F401 — ensure importable
    from ksml_spark.sources.files import TABLE_NAMES

    c = duckdb.connect()
    for t in TABLE_NAMES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_every_query_has_callable_and_oracle_alignment():
    import __spark_entry__ as m

    qs = m.queries()
    oracles = m.oracle_sql()
    assert qs, "queries() must not be empty"
    # every oracle key must correspond to a declared query
    assert set(oracles) <= set(qs), set(oracles) - set(qs)
    for name, fn in qs.items():
        assert callable(fn), name


def test_no_oracle_emits_pandas_unsafe_types(con):
    """HUGEINT/DECIMAL oracle outputs coerce to float in the driver's
    pandas fetch and break value-hash compares — cast them to BIGINT /
    DOUBLE in the SQL instead."""
    import __spark_entry__ as m

    bad = []
    for name, sql in m.oracle_sql().items():
        rel = con.sql(sql)
        for col, ty in zip([d[0] for d in rel.description], rel.types):
            s = str(ty)
            if s in ("HUGEINT", "UHUGEINT") or s.startswith("DECIMAL"):
                bad.append((name, col, s))
    assert not bad, bad


def test_bench_output_lines_stay_driver_parseable():
    """bench.py's final stdout line must stay a single valid-JSON line
    under the driver's ~2000-char tail window, for any mix of many
    queries and failures (the r04 'parsed: null' regression class)."""
    import json as js

    from bench import format_output_lines

    streaming = {"a": {"rows": 10, "seconds": float("nan"), "rows_per_sec": None},
                 "b": {"rows": 10, "seconds": 1.5, "rows_per_sec": 7}}
    q = {f"query_name_with_some_length_{i:03d}": 12.345 for i in range(120)}
    q["broken_query"] = float("nan")
    lines = format_output_lines(321.123, q, streaming, 0.1)
    assert len(lines) == 2
    s = js.loads(lines[0])  # valid JSON despite the NaN input
    assert s["streaming"]["a"]["seconds"] is None
    m = js.loads(lines[1])
    assert len(lines[1]) <= 1900
    assert m["metric"] == "suite_seconds" and m["value"] == 321.123
    # the failed query must survive every degradation rung
    assert "broken_query" in m["queries"]
    assert m["queries"]["broken_query"] is None
    # a degraded (slowest-N) line must point at the full per-query artifact
    assert m["qfull"] == "docs/BENCH_FULL_LATEST.json"
    assert m["n_queries"] == 121
    # small suites pass through un-degraded at full precision
    m2 = js.loads(format_output_lines(1.0, {"q1": 1.234}, {}, 0.01)[-1])
    assert m2["queries"]["q1"] == 1.234
    assert "calib" not in m2  # only emitted when measured
    # the calibration row survives every degradation rung (it is what
    # makes a degraded line adjudicable against host heat, r15)
    big = format_output_lines(321.1, q, streaming, 0.1, calib=1.012)
    mc = js.loads(big[-1])
    assert mc["calib"] == 1.012 and len(big[-1]) <= 1900
    # the Python-stage calibration twin (r17) survives degradation too
    big2 = format_output_lines(321.1, q, streaming, 0.1, calib=1.012,
                               calib_py=1.877)
    mc2 = js.loads(big2[-1])
    assert mc2["calib_py"] == 1.877 and len(big2[-1]) <= 1900
    # skew section rides on its own compact line; the metric line stays LAST
    lines3 = format_output_lines(1.0, {"q1": 1.234}, streaming, 0.01,
                                 skew={"jaccard_plain": 10.2, "agg_plain": 0.3})
    assert len(lines3) == 3
    assert js.loads(lines3[1])["skew"]["jaccard_plain"] == 10.2
    assert js.loads(lines3[-1])["metric"] == "suite_seconds"


def test_every_oracle_nonempty_at_driver_sf():
    """A 0-row oracle result makes the driver's hash compare trivially
    green (caught live: lsh_join's first %41 split produced zero
    candidate pairs at sf0.01) — every oracle must return >= 1 row at
    the driver's correctness SF. DuckDB-only, so cheap."""
    import os

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.01"
    if not os.path.isdir(sf):
        pytest.skip("sf0.01 testdata not present")
    from ksml_spark.sources.files import TABLE_NAMES

    c = duckdb.connect()
    for t in TABLE_NAMES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    empty = []
    for name, sql in m.oracle_sql().items():
        if c.sql(f"SELECT count(*) FROM ({sql})").fetchone()[0] == 0:
            empty.append(name)
    assert not empty, f"trivially-green empty oracles at sf0.01: {empty}"
