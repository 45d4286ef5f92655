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
