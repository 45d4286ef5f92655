"""Empty-input sweep: every registry query against ZERO-ROW tables.

At 100 TB an empty partition, an empty date-slice, or a filter that
matches nothing is a normal state, not an edge case — every query must
either return an empty (or summary-shaped) result or refuse with a
curated error at construction. An opaque runtime failure on empty
input (an eager collect indexing [0], a div-by-zero on a count, an
aggregate feeding a non-nullable cast) is the class this sweep hunts.

Adjudicated r14 baseline (record any drift against it):
- 96 queries return rows-on-empty == 0, except three whose non-empty
  output on empty input is CORRECT by design: profile_persist_lineitem
  and corr_lineitem emit one summary row per audited column (counts 0,
  moments NULL), and expect_contract reports its min_rows contract
  violation — exactly what a data contract must do on an empty table.
- 4 centroid-dependent ops (semdedup_embeddings, semdedup_join,
  ann_ivf_topk, kmeans_centroids) refuse with curated ArityErrors
  ("centroids/init filter matched no rows") — the eager centroid
  collect is the documented bounded-K driver step and an empty
  centroid set has no defined assignment.
- ZERO opaque failures.

Usage: python scripts/empty_sweep.py [query ...]
Exit 0 = no opaque failures and no unexplained nonzero-on-empty.
"""

from __future__ import annotations

import os
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

# queries whose non-empty output on empty input is correct by design
# (summary / contract shapes — see the module docstring)
SUMMARY_SHAPED = {
    "profile_persist_lineitem",
    "corr_lineitem",
    "expect_contract",
}

# the adjudicated curated-refusal set (see the module docstring) —
# drift in EITHER direction is a contract change to re-adjudicate
CURATED_ON_EMPTY = {
    "semdedup_embeddings",
    "semdedup_join",
    "ann_ivf_topk",
    "kmeans_centroids",
}


def build_empty_dir(spark, dest=None) -> str:
    from ksml_spark.sources.files import TABLE_NAMES, load_table

    tmp = dest or tempfile.mkdtemp(prefix="ksml_empty_")
    for t in TABLE_NAMES:
        load_table(spark, "/root/testdata/sf0.001", t).limit(0).write.parquet(
            os.path.join(tmp, f"{t}.parquet")
        )
    return tmp


def sweep(spark, empty_dir, only=()):
    """Classify every registry query on the zero-row tables. Returns
    (ok, curated, opaque, unexplained) — the suite test and the CLI
    share this one implementation."""
    import __spark_entry__ as m
    from ksml_spark.errors import ArityError, TypeDispatchError

    ok, curated, opaque, unexplained = [], [], [], []
    for name, fn in m.queries().items():
        if only and name not in only:
            continue
        try:
            n = fn(spark, empty_dir).count()
            ok.append((name, n))
            if n != 0 and name not in SUMMARY_SHAPED:
                unexplained.append((name, n))
        except (ArityError, TypeDispatchError) as e:
            curated.append((name, type(e).__name__, str(e).split("\n")[0]))
        except Exception as e:  # noqa: BLE001 — the class under audit
            opaque.append((name, type(e).__name__, str(e).split("\n")[0][:160]))
    return ok, curated, opaque, unexplained


def run(only=()):
    from ksml_spark import get_spark

    spark = get_spark()
    ok, curated, opaque, unexplained = sweep(
        spark, build_empty_dir(spark), only
    )

    print(f"ok (ran on empty): {len(ok)}")
    print(f"curated refusals: {len(curated)}")
    for n, c, msg in curated:
        print(f"  CURATED {n}: {c}: {msg[:110]}")
    if unexplained:
        print(f"UNEXPLAINED nonzero-on-empty: {unexplained}")
    print(f"OPAQUE failures: {len(opaque)}")
    for n, c, msg in opaque:
        print(f"  OPAQUE {n}: {c}: {msg}")
    refused = {n for n, _, _ in curated}
    drift = (not only) and refused != CURATED_ON_EMPTY
    if drift:
        print(f"CURATED-SET DRIFT: new={sorted(refused - CURATED_ON_EMPTY)} "
              f"gone={sorted(CURATED_ON_EMPTY - refused)}")
    return 1 if (opaque or unexplained or drift) else 0


if __name__ == "__main__":
    sys.exit(run(set(sys.argv[1:])))
