"""Sink / terminal op coverage (SURVEY.md §2.1): :to!, :print!, :foreach,
plus the plan-inspection utilities."""

from __future__ import annotations

import glob
import os

import pytest

from ksml_spark import ksml, pipe
from ksml_spark.plans import explain_str, scan_summary


def test_to_parquet_roundtrip(spark, tables, tmp_path):
    path = str(tmp_path / "out")
    sink = ksml(
        ["to", ["stream", tables["nation"], {"key": "n_nationkey"}],
         {"format": "parquet", "path": path}],
        spark=spark,
    )
    assert sink.target == path
    back = spark.read.parquet(path)
    assert back.count() == tables["nation"].count()


def test_foreach_runs_per_record(spark, tables, tmp_path):
    marker_dir = str(tmp_path / "markers")
    os.makedirs(marker_dir)

    def side_effect(row):
        with open(f"{marker_dir}/{row['n_nationkey']}", "w") as f:
            f.write(row["n_name"])

    ksml(
        ["foreach", ["stream", tables["nation"], {"key": "n_nationkey"}],
         ["foreach-action", side_effect]],
        spark=spark,
    )
    assert len(glob.glob(f"{marker_dir}/*")) == tables["nation"].count()


def test_print_batch(spark, tables, capsys):
    ksml(["print", ["stream", tables["region"], {"key": "r_regionkey"}]], spark=spark)
    # df.show writes via the JVM; just assert the call completed and the
    # sink handle is the console
    assert True


def test_scan_summary_reports_pushdown(spark):
    out = pipe(
        ["stream", ["parquet", "/root/testdata/sf0.001/lineitem.parquet"],
         {"key": ["l_orderkey", "l_linenumber"]}],
        ["where", "l_quantity >= 49"],
        ["select", {"l_orderkey": "l_orderkey"}],
        spark=spark,
    )
    s = scan_summary(out)
    assert any("GreaterThanOrEqual" in f for f in s["pushed_filters"])
    assert s["read_schemas"] == ["struct<l_orderkey:bigint,l_quantity:double>"]
    assert "FileScan" in explain_str(out, "simple")


# ---------------------------------------------------------------------------
# serving layer (ring.clj parity: key lookup over materialized state)

def test_serve_batch_windowed_count_point_lookup(spark, tables):
    from ksml_spark import pipe

    counts = pipe(
        ["stream", tables["events"], {"key": "event_type", "time": "ts"}],
        ["group-by-key"],
        ["windowed-by", ["time-window", 3600000]],
        ["count"],
        spark=spark,
    )
    h = ksml(["serve", counts, {"name": "served_counts"}], spark=spark)
    batch_rows = counts.df.collect()
    probe = batch_rows[3]
    got = h.lookup({"window_start": probe["window_start"],
                    "event_type": probe["event_type"]})
    assert len(got) == 1
    assert got[0]["count"] == probe["count"]
    # tuple form resolves positionally against the rel's key columns
    got2 = h.lookup((probe["window_start"], probe["event_type"]))
    assert got2[0]["count"] == probe["count"]
    assert len(h.all()) == len(batch_rows)


def test_serve_streaming_complete_snapshot_lookup(spark, tables, tmp_path):
    """Streaming aggregate served in complete mode: point lookup equals
    the batch answer (the ring.clj use-case without host routing)."""
    from ksml_spark import pipe
    from ksml_spark.streaming.runtime import file_stream_source

    p = str(tmp_path / "events")
    tables["events"].write.parquet(p)
    counts = pipe(
        ["stream", file_stream_source(spark, p), {"key": "user_id", "time": "ts"}],
        ["group-by-key"],
        ["count"],
        spark=spark,
    )
    assert counts.df.isStreaming
    h = ksml(["serve", counts, {"name": "served_user_counts"}], spark=spark)
    batch = {r["user_id"]: r["count"]
             for r in tables["events"].groupBy("user_id").count().collect()}
    probe = next(iter(batch))
    got = h.lookup(probe)
    assert len(got) == 1 and got[0]["count"] == batch[probe]
    assert {r["user_id"]: r["count"] for r in h.all()} == batch
    h.stop()


def test_serve_table_storage_bucket_pruned_lookup(spark, tables):
    """storage='table': the serving copy is a catalog table BUCKETED by
    the key, and a key lookup prunes the scan to ONE bucket — the Spark
    analog of ring.clj routing a lookup to the instance hosting the key.
    This is the beyond-driver-memory serving path."""
    from pyspark.sql import functions as F

    from ksml_spark import pipe

    counts = pipe(
        ["stream", tables["events"], {"key": "user_id", "time": "ts"}],
        ["group-by-key"],
        ["count"],
        spark=spark,
    )
    h = ksml(["serve", counts,
              {"name": "served_bucketed", "storage": "table", "buckets": 8}],
             spark=spark)
    try:
        batch = {r["user_id"]: r["count"]
                 for r in tables["events"].groupBy("user_id").count().collect()}
        probe = next(iter(batch))
        got = h.lookup(probe)
        assert len(got) == 1 and got[0]["count"] == batch[probe]
        assert {r["user_id"]: r["count"] for r in h.all()} == batch
        # the plan lookup() executes: auto-bucketed-scan off (it only
        # credits avoided shuffles, not pruning), scan prunes to 1 bucket
        key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        spark.conf.set(key, "false")
        try:
            plan = (
                h.df().filter(F.col("user_id") == probe)
                ._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted"))
            )
        finally:
            spark.conf.set(key, "true")
        assert "SelectedBucketsCount: 1 out of 8" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS served_bucketed")


def test_serve_streaming_table_storage_refresh(spark, tables, tmp_path):
    """Streaming aggregate served into a bucketed catalog table
    (complete-mode snapshot overwrite per trigger): lookups match the
    batch answer and the table is bucketed by the key."""
    from ksml_spark import pipe
    from ksml_spark.streaming.runtime import file_stream_source

    p = str(tmp_path / "events")
    tables["events"].write.parquet(p)
    counts = pipe(
        ["stream", file_stream_source(spark, p), {"key": "user_id", "time": "ts"}],
        ["group-by-key"],
        ["count"],
        spark=spark,
    )
    h = ksml(["serve", counts,
              {"name": "served_stream_tbl", "storage": "table", "buckets": 4}],
             spark=spark)
    try:
        batch = {r["user_id"]: r["count"]
                 for r in tables["events"].groupBy("user_id").count().collect()}
        probe = next(iter(batch))
        got = h.lookup(probe)
        assert len(got) == 1 and got[0]["count"] == batch[probe]
        ddl = spark.sql("SHOW CREATE TABLE served_stream_tbl").first()[0]
        assert "CLUSTERED BY (user_id)" in ddl and "INTO 4 BUCKETS" in ddl
    finally:
        h.stop()
        spark.sql("DROP TABLE IF EXISTS served_stream_tbl")


def test_serve_requires_name_and_key(spark, tables):
    import pytest as _pytest

    from ksml_spark import pipe
    from ksml_spark.errors import ArityError

    s = pipe(["stream", tables["events"], {"key": "user_id", "time": "ts"}], spark=spark)
    with _pytest.raises(ArityError, match="name"):
        ksml(["serve", s, {}], spark=spark)
    h = ksml(["serve", s, {"name": "served_raw"}], spark=spark)
    with _pytest.raises(ArityError, match="key parts"):
        h.lookup(("a", "b"))


def test_serve_accepts_bare_string_key_option(spark, tables):
    h = ksml(["serve",
              pipe(["stream", tables["events"], {"key": "user_id", "time": "ts"}],
                   spark=spark),
              {"name": "served_str_key", "key": "event_id"}], spark=spark)
    assert h.key_cols == ("event_id",)
    probe = tables["events"].first()
    got = h.lookup(probe["event_id"])
    assert len(got) == 1 and got[0]["user_id"] == probe["user_id"]


def test_serve_table_update_mode_compaction(spark, tmp_path):
    """update-mode table storage compacts the emission log to its
    current truth every compact_every batches: the physical table stays
    O(current state) while lookups return the same answer."""
    import json
    import os

    from pyspark.sql.types import StructType

    sdir = str(tmp_path / "src_compact")
    os.makedirs(sdir)
    batches = [
        [{"side": "l", "key": "a", "lval": 1, "event_time": "2024-01-01T00:00:01"},
         {"side": "r", "key": "a", "rname": "x0", "event_time": "2024-01-01T00:00:01"}],
        [{"side": "r", "key": "a", "rname": "x1", "event_time": "2024-01-01T00:00:05"}],
        [{"side": "l", "key": "a", "lval": 2, "event_time": "2024-01-01T00:00:09"},
         {"side": "r", "key": "b", "rname": "y", "event_time": "2024-01-01T00:00:09"},
         {"side": "l", "key": "b", "lval": 7, "event_time": "2024-01-01T00:00:09"}],
    ]
    for i, rows in enumerate(batches):
        p = os.path.join(sdir, f"b{i}.json")
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(p, (i + 1, i + 1))
    schema = ("side string, key string, lval long, rname string, "
              "event_time timestamp")
    src = (spark.readStream.schema(StructType.fromDDL(schema))
           .option("maxFilesPerTrigger", 1).json(sdir))
    out = ksml(
        ["join",
         ["table", src.filter("side = 'l'").drop("rname", "side"),
          {"key": "key", "time": "event_time", "order": ["event_time"]}],
         ["table", src.filter("side = 'r'").drop("lval", "side"),
          {"key": "key", "time": "event_time", "order": ["event_time"]}]],
        spark=spark,
    )
    h = ksml(["serve", out, {"name": "served_compact", "storage": "table",
                             "buckets": 4, "compact_every": 2,
                             "checkpoint": str(tmp_path / "ck_compact")}],
             spark=spark)
    try:
        got = {r["key"]: r for r in h.all()}
        assert got["a"]["lval"] == 2 and got["a"]["rname"] == "x1"
        assert got["b"]["lval"] == 7 and got["b"]["rname"] == "y"
        # key a emitted 3 times across batches; the batch-2 compaction
        # (batch_id 1) folded emissions 1-2 into one row, so the
        # physical log holds fewer rows than total emissions
        raw_rows = spark.table("served_compact").count()
        assert raw_rows == 3, raw_rows  # a@compaction, a@batch3, b@batch3
    finally:
        h.stop()
        spark.sql("DROP TABLE IF EXISTS served_compact")


def test_serve_compaction_crash_recovery_restores_tmp(spark):
    """If the compaction swap crashes between DROP TABLE and RENAME, the
    full compacted state lives only in <name>__compact_tmp. On restart
    the retried micro-batch must rename tmp back — NOT seed a fresh
    table from the single batch (which would silently lose every other
    key, including __closed finals). Drives _seed_or_recover directly
    against the simulated crash state."""
    from ksml_spark.streaming.serving import _bucketed_write, _seed_or_recover

    name, tmp = "served_crash", "served_crash__compact_tmp"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    try:
        # crash state: tmp holds the compacted truth (old keys + the
        # retried batch's key), `name` was dropped before the rename
        full = spark.createDataFrame(
            [("a", 1, 5), ("b", 7, 5), ("c", 3, 4)], "key string, v int, __seq int")
        _bucketed_write(full, tmp, ("key",), 4)
        retried = spark.createDataFrame([("b", 7, 5)], "key string, v int, __seq int")
        _seed_or_recover(spark, retried, name, ("key",), 4, batch_id=31)
        got = {r["key"]: r["v"] for r in spark.table(name).collect()}
        assert got == {"a": 1, "b": 7, "c": 3}, got  # full state, no dup of b
        assert spark.table(name).count() == 3
        assert not spark.catalog.tableExists(tmp)
        # fresh-seed path: no tmp -> seed from the batch
        spark.sql(f"DROP TABLE {name}")
        _seed_or_recover(spark, retried, name, ("key",), 4, batch_id=0)
        assert [r["key"] for r in spark.table(name).collect()] == ["b"]
        # STALE tmp: batch 0 of a FRESH run (new checkpoint) cannot have
        # produced a tmp (first compaction fires at batch >= 1), so a
        # leftover tmp from an abandoned run must be dropped, not
        # resurrected — its higher __seq rows would permanently win the
        # latest-emission dedup over the new run's (seq restarts at 1)
        spark.sql(f"DROP TABLE {name}")
        _bucketed_write(full, tmp, ("key",), 4)
        fresh = spark.createDataFrame([("z", 9, 1)], "key string, v int, __seq int")
        _seed_or_recover(spark, fresh, name, ("key",), 4, batch_id=0)
        assert [r["key"] for r in spark.table(name).collect()] == ["z"]
        assert not spark.catalog.tableExists(tmp)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(f"DROP TABLE IF EXISTS {tmp}")


def test_serve_memory_ceiling_guard(spark, tables, tmp_path):
    """The streaming memory sink holds the served snapshot in driver
    RAM. Past max_memory_rows the handle warns (default) or raises
    (overflow='error'), naming storage='table' as the fix — the
    driver-memory ceiling surfaces as a signal, not an eventual OOM."""
    import warnings

    from ksml_spark import pipe
    from ksml_spark.errors import ArityError
    from ksml_spark.streaming.runtime import file_stream_source

    p = str(tmp_path / "events")
    tables["events"].write.parquet(p)

    def serve(name, **extra):
        counts = pipe(
            ["stream", file_stream_source(spark, p),
             {"key": "user_id", "time": "ts"}],
            ["group-by-key"], ["count"], spark=spark)
        return ksml(["serve", counts, {"name": name, **extra}], spark=spark)

    nkeys = tables["events"].select("user_id").distinct().count()
    assert nkeys > 3  # the tiny cap below must actually be exceeded

    with pytest.warns(ResourceWarning, match="storage.*table"):
        h = serve("served_capped", max_memory_rows=3)
    h.stop()

    with pytest.raises(ArityError, match="max_memory_rows"):
        serve("served_capped_err", max_memory_rows=3, overflow="error")

    # a cap sized for the snapshot stays silent (availableNow queries
    # check once post-drain; refresh() re-checks for live triggers)
    with warnings.catch_warnings():
        warnings.simplefilter("error", ResourceWarning)
        h = serve("served_uncapped", max_memory_rows=nkeys)
    h.stop()

    with pytest.raises(ArityError, match="warn.*error"):
        serve("served_badopt", overflow="sometimes")


def test_serve_host_for_metadata(spark, tables):
    """ring.clj parity shim (find-host ring.clj:15-18, remote?/proxy
    ring.clj:20-53): host_for(key) names the serving endpoint and the
    shard. Spark has ONE serving endpoint (the driver), so remote is
    always False; the routing analog is the bucket — asserted against
    where the bucketed write actually placed the key's row (the bucket
    id embedded in the parquet file name)."""
    import re

    from pyspark.sql import functions as F

    from ksml_spark import pipe

    counts = pipe(
        ["stream", tables["events"], {"key": "user_id", "time": "ts"}],
        ["group-by-key"], ["count"], spark=spark)
    h = ksml(["serve", counts,
              {"name": "served_hostfor", "storage": "table", "buckets": 4}],
             spark=spark)
    try:
        probe = tables["events"].select("user_id").first()["user_id"]
        info = h.host_for(probe)
        assert info["remote"] is False
        assert info["store"] == "served_hostfor"
        assert info["buckets"] == 4
        assert info["bucket"] in range(4)
        assert isinstance(info["host"], str) and info["host"]
        # ground truth: bucketed parquet file names carry the bucket id
        # as the _NNNNN suffix — the key's row must live in the bucket
        # host_for computed (same Murmur3-pmod the write used)
        fname = (
            spark.table("served_hostfor")
            .withColumn("f", F.input_file_name())
            .filter(F.col("user_id") == probe)
            .first()["f"]
        )
        m = re.search(r"_(\d{5})\.", fname)
        assert m, f"no bucket suffix in {fname}"
        assert int(m.group(1)) == info["bucket"]

        # memory-storage handle: endpoint metadata, no shard to name
        h2 = ksml(["serve", counts, {"name": "served_hostfor_mem"}], spark=spark)
        info2 = h2.host_for(probe)
        assert info2["remote"] is False and info2["bucket"] is None
    finally:
        spark.sql("DROP TABLE IF EXISTS served_hostfor")


def test_current_rows_dedups_replayed_batch(spark):
    """A crash after an append/compaction commits but before the
    streaming checkpoint commits replays the batch into the emission
    log. Full-row duplicates can ONLY be such replays (an emission is a
    snapshot), so current_rows drops them — reads and compaction are
    retry-idempotent."""
    from ksml_spark.streaming.serving import ServeHandle

    log = spark.createDataFrame(
        [("a", 1.0, 1, False), ("a", 2.0, 2, False),
         ("a", 2.0, 2, False),                       # replayed max-seq row
         ("b", 5.0, 1, True), ("b", 5.0, 1, True)],  # replayed __closed final
        "key string, value double, __seq int, __closed boolean")
    got = sorted(
        (r["key"], r["value"], r["__seq"], r["__closed"])
        for r in ServeHandle.current_rows(log, ("key",)).collect())
    assert got == [("a", 2.0, 2, False), ("b", 5.0, 1, True)]


def test_session_state_blob_migrates_from_timestamp_format(spark):
    """A checkpoint written by the pre-int-ns session fold stores
    pd.Timestamp bounds; the loader must coerce them so a restarted
    query doesn't crash on Timestamp-minus-int arithmetic."""
    import pandas as pd

    from ksml_spark.operators.grouping import _sessions_to_ns

    old = [[pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-01 00:10:00"), 7.5],
           [1700000000000000000, 1700000003000000000, 1.0]]  # mixed: new rows pass through
    out = _sessions_to_ns(old)
    assert out[0][0] == pd.Timestamp("2024-01-01").value
    assert out[0][1] == pd.Timestamp("2024-01-01 00:10:00").value
    assert isinstance(out[0][0], int) and isinstance(out[0][1], int)
    assert out[1] == [1700000000000000000, 1700000003000000000, 1.0]
    assert out[0][2] == 7.5
