"""Partition-invariance sweep (new r15 audit class).

The correctness gate proves every registry query matches DuckDB at ONE
physical layout (local[32], 32 shuffle partitions, 128M scan splits).
This probe checks the claim the 100 TB posture actually rests on: the
RESULT must be invariant to physical parallelism — on a 1000-executor
cluster the shuffle partition count, scan split sizes, and AQE's
runtime coalescing all differ from the test box, and any query whose
values move with them (an unordered LIMIT, a first()/any_value, a
partial-sum float ordering that the data does not protect, a pandas-UDF
batch-boundary dependence) is silently irreproducible at scale.

Method: run every __spark_entry__ query twice in one session and
compare order-insensitive value signatures (check_oracle's normalizer,
signed-zero collapse included):

  baseline — the registry's own tuning (32 shuffle partitions, default
  128M maxPartitionBytes, AQE on);
  variant  — 7 shuffle partitions + 1M maxPartitionBytes (every scan
  shatters into many small splits; every shuffle lands on a different
  partition count and AQE re-coalesces differently), AQE still on.

``spark.catalog.clearCache()`` before every execution: a DISK_ONLY
relation persisted under the baseline layout would otherwise be REUSED
by CacheManager in the variant run and mask exactly the dependence this
probe hunts.

Usage: python scripts/partition_probe.py [sf_dir] [query ...]
Exit 0 = every query partition-invariant; nonzero lists divergers.
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "scripts"))

VARIANT = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.files.maxPartitionBytes": str(1024 * 1024),
}


def sweep(spark, sf_dir: str, only=None, verbose: bool = True):
    """Returns (diverged, errors): query names whose value signature
    moved between the two layouts, and names that failed outright in
    either layout (an error in ONE layout only is itself a finding)."""
    import __spark_entry__ as entrymod
    from check_oracle import table_signature

    qs = entrymod.queries()
    baseline_conf = {k: None for k in VARIANT}

    def run_all(label: str) -> tuple[dict, dict]:
        sigs, errs = {}, {}
        for name, fn in qs.items():
            if only and name not in only:
                continue
            spark.catalog.clearCache()
            try:
                df = fn(spark, sf_dir)
                rows = [tuple(r) for r in df.collect()]
                sigs[name] = table_signature(rows, df.columns)[0]
            except Exception as e:
                errs[name] = f"{type(e).__name__}: {e}"
        return sigs, errs

    # baseline first (the registry's own _tune sets 32/AQE on first use),
    # capture the session defaults we are about to override
    base_sigs, base_errs = run_all("baseline")
    for k in VARIANT:
        try:
            baseline_conf[k] = spark.conf.get(k)
        except Exception:
            baseline_conf[k] = None
    for k, v in VARIANT.items():
        spark.conf.set(k, v)
    try:
        var_sigs, var_errs = run_all("variant")
    finally:
        for k, v in baseline_conf.items():
            if v is not None:
                spark.conf.set(k, v)
        spark.catalog.clearCache()

    diverged, errors = [], []
    for name in sorted(set(base_sigs) | set(base_errs)):
        b, v = base_sigs.get(name), var_sigs.get(name)
        if name in base_errs or name in var_errs:
            errors.append(name)
            if verbose:
                print(f"ERR   {name}: baseline={base_errs.get(name)} "
                      f"variant={var_errs.get(name)}")
        elif b != v:
            diverged.append(name)
            if verbose:
                print(f"DIVERGE {name}: {b} != {v}")
        elif verbose:
            print(f"OK    {name}: {b}")
    return diverged, errors


def main() -> int:
    from ksml_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None
    t0 = time.time()
    spark = get_spark(app_name="ksml-partition-probe")
    diverged, errors = sweep(spark, sf_dir, only)
    print(f"\ndiverged: {diverged}\nerrors: {errors}  [{time.time()-t0:.0f}s]")
    return 1 if (diverged or errors) else 0


if __name__ == "__main__":
    sys.exit(main())
