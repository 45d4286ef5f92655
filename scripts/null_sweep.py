"""NULL-injection oracle sweep (new r15 audit class).

The driver correctness gate runs on testdata with no NULLs in any
column, so the engine's NULL handling has only ever been exercised by
targeted unit tests — while at 100 TB a NULL-laden column is a normal
state (failed upstream parses, optional fields, late-arriving
enrichment). This sweep builds a null-injected COPY of a testdata SF
dir (deterministic: md5(pk)-salted per (table, column), ~1/17 of rows
per column, value columns only by default — key/id/time columns keep
the pipeline's join/group/window semantics intact and get their own
variant) and re-runs the FULL DuckDB oracle gate on it: Spark query and
oracle SQL read the same nulled parquet, so a hash mismatch is either
an engine NULL bug (opaque crash, silent-wrong) or a documented
cross-engine NULL-semantics class to pin — the unicode_probe method on
a new axis.

Usage: python scripts/null_sweep.py [--keys] [sf_dir] [query ...]
  default — value columns injected (~1/17 per column)
  --keys  — ONLY foreign-key columns injected (~1/29; unknown user /
            unmatched enrichment, the realistic dirty-join class)
Exit 0 = the full gate is green on the nulled copy.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "scripts"))

# columns never injected: join/group keys, ids, and event-time columns
# (a NULL key/time is a different audit axis — see docstring)
KEY_LIKE = ("_id", "key", "doc_id", "vec_id", "user_id")

# the --keys variant's injection set: FOREIGN-key-ish columns — the
# realistic dirty-data class (unknown user, unmatched enrichment).
# Primary ids (doc_id, o_orderkey, ...) stay non-NULL: a NULL primary
# key breaks the data model itself, not an operator.
FK_COLS = {
    ("events", "user_id"),
    ("orders", "o_custkey"),
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("customer", "c_nationkey"),
    ("supplier", "s_nationkey"),
}


def _is_key(col: str) -> bool:
    c = col.lower()
    return c.endswith(KEY_LIKE) or c in ("ts", "o_orderdate", "l_shipdate")


def build_nulled_dir(spark, sf_dir: str, out_dir: str,
                     rate_mod: int = 17, keys: bool = False) -> str:
    """Writes a null-injected copy of every table: value column c of
    table t goes NULL where md5(t || c || pk-ish row fingerprint) % N
    == 0. Deterministic (no Date/random), re-creatable by anyone."""
    os.makedirs(out_dir, exist_ok=True)
    # the source events.ts is TIMESTAMP(NANOS); load_table converts it
    # to a micros TIMESTAMP, but Spark 4 write round-trips that column
    # back to timestamp[ns], which re-triggers the engine's nano-as-long
    # read path INCONSISTENTLY (Spark reads its own ns metadata as
    # TIMESTAMP while the footer says ns). Pin the copy to micros — the
    # exact values load_table/DuckDB already compare on. Save/restored
    # around the writes (the read_parquet inferTimestampNTZ pattern) so
    # a shared session — e.g. the pytest fixture — keeps its default
    # timestamp encoding for everything written after the sweep.
    ts_key = "spark.sql.parquet.outputTimestampType"
    ts_prev = spark.conf.get(ts_key)
    spark.conf.set(ts_key, "TIMESTAMP_MICROS")
    try:
        _write_nulled_tables(spark, sf_dir, out_dir, rate_mod, keys)
    finally:
        spark.conf.set(ts_key, ts_prev)
    return out_dir


def _write_nulled_tables(spark, sf_dir: str, out_dir: str,
                         rate_mod: int, keys: bool) -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType

    from ksml_spark.sources.files import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        df = load_table(spark, sf_dir, t)
        array_cols = {f.name for f in df.schema.fields
                      if isinstance(f.dataType, ArrayType)}
        # timestamps stay LTZ micros (outputTimestampType above): the
        # copy is UTC-adjusted where the source testdata is naive, so
        # DuckDB returns tz-aware datetimes for the SAME instants —
        # check_oracle.norm_cell normalizes aware-UTC to naive (an NTZ
        # write was tried first and leaks TIMESTAMP_NTZ into the
        # engine's read path, which window/asof time arithmetic rejects)
        # row fingerprint: every column's string form (stable, pk-free),
        # MATERIALIZED once from the pristine df so each column's
        # injection mask is independent of injection order — an
        # unresolved Column would re-resolve against already-nulled
        # earlier columns (concat_ws skips NULLs), correlating the masks
        fp = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string")
                                         for c in df.columns]))
        out = df.withColumn("__fp", fp)
        for c in df.columns:
            # array columns (embeddings.embedding) are NOT injected:
            # the engine's NULL/degenerate-vector envelope is already
            # oracle-exact-pinned at the unit level (_valid_vec), and
            # DuckDB's list functions ERROR on NULL-containing lists
            # rather than propagate NULL, so a naive SQL mirror cannot
            # even express the comparison
            if keys:
                # --keys variant: ONLY the FK allowlist goes NULL (at a
                # lower 1/29 rate), value columns stay intact — the two
                # variants isolate which axis a divergence comes from
                if (t, c) not in FK_COLS:
                    continue
            elif _is_key(c) or c in array_cols:
                continue
            salt = F.md5(F.concat(F.lit(f"{t}.{c}:"), F.col("__fp")))
            mod = 29 if keys else rate_mod
            mask = (F.conv(F.substring(salt, 1, 8), 16, 10)
                    .cast("long") % mod) == 0
            out = out.withColumn(c, F.when(mask, F.lit(None)).otherwise(F.col(c)))
        out = out.drop("__fp")
        # single FILE per table (not a Spark part-directory): the oracle
        # harness points DuckDB at '{dir}/{t}.parquet' exactly like the
        # driver testdata layout
        tmp = os.path.join(out_dir, f"__tmp_{t}")
        out.coalesce(1).write.mode("overwrite").parquet(tmp)
        import glob as _glob
        import shutil

        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(out_dir, f"{t}.parquet"))
        shutil.rmtree(tmp)


def main() -> int:
    from check_oracle import run_gate

    from ksml_spark import get_spark

    args = [a for a in sys.argv[1:] if a != "--keys"]
    keys = "--keys" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:]) or None
    suffix = "_keys" if keys else ""
    out_dir = os.path.join(
        "/tmp", "ksml_nulled" + suffix + "_" + os.path.basename(sf_dir.rstrip("/")))
    spark = get_spark(app_name="ksml-null-sweep")
    build_nulled_dir(spark, sf_dir, out_dir, keys=keys)
    print(f"nulled copy at {out_dir}; running the oracle gate on it")
    return 1 if run_gate(spark, out_dir, only) else 0


if __name__ == "__main__":
    sys.exit(main())
