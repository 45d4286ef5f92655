"""Shared fixtures: one SparkSession per test session (JVM start is
expensive here), testdata readers, and small in-memory fixture frames
mirroring FIXTURES.md."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("KSML_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    from ksml_spark.session import get_spark

    s = get_spark(app_name="ksml-tests", conf={"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    """Lazy dict of the driver's parquet tables at sf0.001."""

    from ksml_spark.sources.files import load_table

    class T(dict):
        def __missing__(self, name):
            df = load_table(spark, SF_DIR, name)
            self[name] = df
            return df

    return T()


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="session")
def kv_updates(spark):
    """FIXTURES.md F6: keyed updates with tombstones (nullable value)."""
    rows = [
        ("a", "v1", ts("2024-01-01T00:00:01")),
        ("a", "v2", ts("2024-01-01T00:00:02")),
        ("b", "v1", ts("2024-01-01T00:00:01")),
        ("b", None, ts("2024-01-01T00:00:03")),  # tombstone -> b deleted
        ("c", "v9", ts("2024-01-01T00:00:05")),
        ("c", "v3", ts("2024-01-01T00:00:04")),  # older, must lose
        ("d", None, ts("2024-01-01T00:00:01")),
        ("d", "v4", ts("2024-01-01T00:00:02")),  # resurrect after tombstone
    ]
    return spark.createDataFrame(rows, "key string, value string, event_time timestamp")


@pytest.fixture(scope="session")
def left_right(spark):
    """FIXTURES.md F3: join fixtures with partial key overlap."""
    left = spark.createDataFrame(
        [
            ("k1", 1, "l-one", ts("2024-01-01T00:00:00.0")),
            ("k2", 2, "l-two", ts("2024-01-01T00:00:01.0")),
            ("k3", 3, "l-three", ts("2024-01-01T00:00:02.0")),
            ("k4", 4, "l-four", ts("2024-01-01T00:00:03.0")),
        ],
        "key string, id long, payload string, event_time timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", 1, "r-one", ts("2024-01-01T00:00:00.5")),   # within 1s of l.k1
            ("k2", 2, "r-two", ts("2024-01-01T00:00:03.5")),   # >1s from l.k2
            ("k5", 5, "r-five", ts("2024-01-01T00:00:04.0")),  # right-only
        ],
        "key string, id long, payload string, event_time timestamp",
    )
    return left, right
