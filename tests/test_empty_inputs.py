"""Empty-input contract: every registry query on ZERO-ROW tables either
returns an empty (or summary-shaped) result or refuses curatedly.

At 100 TB an empty partition / date-slice / filter-matched-nothing is a
normal state — an opaque runtime failure on empty input (an eager
collect indexing [0], a div-by-zero on a count, a non-nullable cast fed
by an empty aggregate) is the class this pins. The adjudicated r14
baseline lives in scripts/empty_sweep.py (the standalone audit); this
test locks the contract into the suite.
"""

from __future__ import annotations

import os

import pytest

# non-empty output on empty input is CORRECT for summary/contract ops:
# profile/corr emit one row per audited column (counts 0, moments
# NULL); expect reports the min_rows violation an empty table IS.
SUMMARY_SHAPED = {
    "profile_persist_lineitem",
    "corr_lineitem",
    "expect_contract",
}

# centroid-dependent ops: the eager bounded-K centroid collect is the
# documented driver step, and an empty centroid set has no defined
# assignment — a curated refusal is the contract, pinned below.
CURATED_ON_EMPTY = {
    "semdedup_embeddings",
    "semdedup_join",
    "ann_ivf_topk",
    "kmeans_centroids",
}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    from ksml_spark.sources.files import TABLE_NAMES, load_table

    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLE_NAMES:
        load_table(spark, "/root/testdata/sf0.001", t).limit(0).write.parquet(
            os.path.join(str(d), f"{t}.parquet")
        )
    return str(d)


def test_registry_empty_input_contract(spark, empty_sf_dir):
    import __spark_entry__ as m
    from ksml_spark.errors import ArityError, TypeDispatchError

    opaque, unexplained, refused = [], [], set()
    for name, fn in m.queries().items():
        try:
            n = fn(spark, empty_sf_dir).count()
        except (ArityError, TypeDispatchError):
            refused.add(name)
            continue
        except Exception as e:  # noqa: BLE001 — the class under audit
            opaque.append((name, type(e).__name__, str(e).split("\n")[0][:120]))
            continue
        if n != 0 and name not in SUMMARY_SHAPED:
            unexplained.append((name, n))

    assert not opaque, f"opaque failures on empty input: {opaque}"
    assert not unexplained, f"unexpected rows on empty input: {unexplained}"
    assert refused == CURATED_ON_EMPTY, (
        "curated-refusal set drifted: "
        f"new={sorted(refused - CURATED_ON_EMPTY)} "
        f"gone={sorted(CURATED_ON_EMPTY - refused)}"
    )
