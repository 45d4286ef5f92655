"""Batch file sources for the driver's testdata tables.

``events.parquet`` stores its timestamp as parquet TIMESTAMP(NANOS), which
Spark's vectorized reader rejects (PARQUET_TYPE_ILLEGAL). We read nano
columns as longs (legacy conf, runtime-settable) and rebuild proper
timestamps with floor-division to microseconds — bit-identical to DuckDB's
own ns->us truncation, so oracle comparisons stay exact.

Detection is metadata-only (pyarrow reads just the footer; no data pass).
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@lru_cache(maxsize=256)
def _nano_timestamp_cols(path: str) -> tuple[str, ...]:
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return tuple(f.name for f in schema if str(f.type) == "timestamp[ns]")
    except Exception:
        return ()


# Inferred RAW read schemas (before the nano->timestamp rebuild) per
# path, process-lifetime (r18, guide §6 fixed-cost): a bare
# ``spark.read.parquet(path)`` runs an EAGER 1-task schema-inference job
# on every call — ~0.1s of per-invocation fixed cost on every table a
# query loads, paid again on each bench pass. Supplying the schema
# (``spark.read.schema(s).parquet``) skips that job entirely, exactly as
# a production deployment declares its table schemas in a catalog. This
# caches METADATA only — every action still reads the parquet data
# itself; the testdata contract (deterministic, immutable within a run)
# is the same one the pyarrow footer cache above already relies on.
# StructType is session-independent, so a restarted session reuses it.
_SCHEMA_CACHE: dict[str, object] = {}


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet with transparent TIMESTAMP(NANOS) handling.

    Also pins ``inferTimestampNTZ`` off: the testdata stores timestamps as
    isAdjustedToUTC=false, which Spark 4 would otherwise surface as
    TIMESTAMP_NTZ — a type watermarks/windows reject in streaming and that
    diverges from the engine's TIMESTAMP(LTZ) column model. Reading them as
    LTZ under the UTC session timezone preserves wall-clock values exactly
    (bit-identical to DuckDB's naive reading).

    ``inferTimestampNTZ`` is save/restored around the (eager)
    schema-inference read — the 4.1.2 reader ignores a per-read option,
    and a permanent ``spark.conf.set`` would silently change NTZ
    inference for user code outside this framework. ``nanosAsLong`` is
    NOT restored, deliberately: the parquet scan re-reads it at
    execution time (action time, not read_parquet time), so restoring it
    here would crash every later action on the returned DataFrame. The
    conf is only ever flipped when the file actually has nano columns,
    and its effect on outside code is to read TIMESTAMP(NANOS) columns
    as BIGINT instead of erroring (PARQUET_TYPE_ILLEGAL)."""
    conf = spark.conf
    nanos = _nano_timestamp_cols(path)
    nanos_key = "spark.sql.legacy.parquet.nanosAsLong"
    if nanos:
        conf.set(nanos_key, "true")
    cached = _SCHEMA_CACHE.get(path)
    if cached is not None:
        # schema known: no inference job runs, and with no inference the
        # NTZ conf is irrelevant (the cached schema was inferred with it
        # pinned off). nanosAsLong still matters — the SCAN reads it at
        # action time to map TIMESTAMP(NANOS) onto the LongType field.
        df = spark.read.schema(cached).parquet(path)
    else:
        ntz_prev = conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
        conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        try:
            df = spark.read.parquet(path)
        finally:
            conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", ntz_prev)
        _SCHEMA_CACHE[path] = df.schema
    for c in nanos:
        # Integer division, not float: at epoch-ns magnitude doubles have
        # 256ns ulp, so `/ 1000` rounds ~1.6% of values off by 1us.
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
