"""Kafka end-to-end integration (VERDICT r01 item 3).

The reference surface is Kafka-only (/root/reference/src/cddr/ksml/
eval.clj:24-38). No broker exists in this container, so the transport is
the file-backed fake in ksml_spark.sources.kafka ({'fake_dir': ...}) —
records carry the EXACT Kafka schema (binary key/value, topic, partition,
offset, timestamp) and the entire pipeline between produce and consume is
the real code path: kafka_source option plumbing, subscribe filtering,
serde decode, timestamp extraction, watermark, windowed aggregation, and
kafka_sink encode back to (key, value) records.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from ksml_spark import ksml, pipe
from ksml_spark.sources.files import load_table
from ksml_spark.sources.kafka import KAFKA_RECORD_DDL, write_fake_topic

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fake_topic(spark, tmp_path_factory):
    """events seeded as Kafka records into a fake topic dir."""
    d = str(tmp_path_factory.mktemp("kafka") / "broker")
    ev = load_table(spark, SF, "events").select("user_id", "event_type", "event_id", "ts")
    write_fake_topic(
        ev, d, topic="events", key_col="user_id",
        value_cols=["event_type", "event_id"], time_col="ts",
    )
    # a second topic in the same transport: subscribe must exclude it
    write_fake_topic(
        ev.limit(7), d, topic="other", key_col="user_id",
        value_cols=["event_type", "event_id"], time_col="ts",
    )
    return d


def test_fake_topic_has_kafka_record_schema(spark, fake_topic):
    from pyspark.sql.types import StructType

    df = spark.read.schema(StructType.fromDDL(KAFKA_RECORD_DDL)).parquet(fake_topic)
    assert df.columns == ["key", "value", "topic", "partition",
                          "offset", "timestamp", "timestampType"]
    r = df.filter("topic = 'events'").first()
    assert isinstance(r["key"], (bytes, bytearray))
    assert json.loads(bytes(r["value"]).decode()).keys() == {"event_type", "event_id"}
    # per-partition offsets are dense from 0
    offs = df.filter("topic = 'events'").groupBy("partition").agg(
        F.min("offset").alias("lo"), F.max("offset").alias("hi"),
        F.count("*").alias("n")).collect()
    for row in offs:
        assert row["lo"] == 0 and row["hi"] == row["n"] - 1


def test_kafka_batch_consume_decodes_and_filters_topic(spark, fake_topic):
    out = ksml(
        ["stream",
         ["kafka", {"subscribe": "events", "fake_dir": fake_topic}],
         ["consumed",
          ["serde", "String"],
          ["serde", "json", "event_type string, event_id long"],
          ["timestamp-extractor", "timestamp", "fail"]],
         {"stream": False}],
        spark=spark,
    )
    n_events = load_table(spark, SF, "events").count()
    rows = out.df.select("key", "value.event_type", "event_time").collect()
    assert len(rows) == n_events  # 'other' topic filtered out
    assert all(isinstance(r["key"], str) for r in rows[:5])
    assert all(r["event_time"] is not None for r in rows[:5])


def test_kafka_e2e_stream_window_count_to_kafka_sink(spark, fake_topic, tmp_path):
    """The full chain the reference runs on a broker: consume -> serde
    decode -> timestamp extract -> watermark -> windowed count -> encode
    -> produce. Batch recomputation is the oracle."""
    out_dir = str(tmp_path / "counts_topic")
    sink = pipe(
        ["stream",
         ["kafka", {"subscribe": "events", "fake_dir": fake_topic}],
         ["consumed",
          ["serde", "String"],
          ["serde", "json", "event_type string, event_id long"],
          ["timestamp-extractor", "timestamp", "fail"]]],
        ["with-watermark", "1 hour"],
        ["group-by", ["key-value-mapper", {"event_type": "value.event_type"}]],
        ["windowed-by", ["time-window", 3600000]],
        ["count"],
        ["to",
         ["serde", "json", "window_start timestamp, event_type string"],
         ["serde", "json", "window_end timestamp, count bigint"],
         "counts",
         {"fake_dir": out_dir, "checkpoint": str(tmp_path / "ckpt"),
          "trigger": "available_now", "output_mode": "update"}],
        spark=spark,
    )
    assert sink.query is not None
    sink.query.awaitTermination(120)

    from pyspark.sql.types import StructType

    rec = spark.read.schema(StructType.fromDDL(KAFKA_RECORD_DDL)).parquet(out_dir)
    assert rec.filter("topic = 'counts'").count() == rec.count()
    got = rec.select(
        F.from_json(F.col("key").cast("string"),
                    "window_start timestamp, event_type string").alias("k"),
        F.from_json(F.col("value").cast("string"),
                    "window_end timestamp, count bigint").alias("v"),
    ).select("k.window_start", "k.event_type", "v.count").collect()
    got_map = {(r["window_start"], r["event_type"]): r["count"] for r in got}
    assert len(got_map) == len(got)  # single availableNow batch: one emit each

    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .count()
        .select(F.col("window.start").alias("ws"), "event_type", "count")
        .collect()
    )
    expected = {(r["ws"], r["event_type"]): r["count"] for r in batch}
    assert got_map == expected


def test_kafka_pattern_subscription(spark, fake_topic):
    """Regex topic subscription (eval_test.clj:103-141 — the reference's
    most-tested source form, Pattern/compile → subscribePattern): 'ev.*'
    must match the events topic and exclude 'other'."""
    out = ksml(
        ["stream",
         ["kafka", {"pattern": "ev.*", "fake_dir": fake_topic}],
         ["consumed",
          ["serde", "String"],
          ["serde", "json", "event_type string, event_id long"],
          ["timestamp-extractor", "timestamp", "fail"]],
         {"stream": False}],
        spark=spark,
    )
    n_events = load_table(spark, SF, "events").count()
    assert out.df.count() == n_events  # 'other' not matched by the pattern

    # a broader pattern picks up both topics
    both = ksml(
        ["stream",
         ["kafka", {"pattern": "ev.*|oth.*", "fake_dir": fake_topic}],
         {"stream": False}],
        spark=spark,
    )
    assert both.df.count() == n_events + 7


def test_kafka_pattern_subscription_streaming(spark, fake_topic, tmp_path):
    """Streaming variant: pattern-filtered consume -> serde -> count by
    event_type, parity with a batch recomputation over the same topic."""
    out = pipe(
        ["stream",
         ["kafka", {"pattern": "ev.*", "fake_dir": fake_topic}],
         ["consumed",
          ["serde", "String"],
          ["serde", "json", "event_type string, event_id long"],
          ["timestamp-extractor", "timestamp", "fail"]]],
        ["group-by", ["key-value-mapper", {"event_type": "value.event_type"}]],
        ["count"],
        spark=spark,
    )
    assert out.df.isStreaming
    sink = ksml(
        ["to", out, {"format": "memory", "name": "pat_counts",
                     "output_mode": "complete", "trigger": "available_now"}],
        spark=spark,
    )
    sink.query.awaitTermination(120)
    sink.query.stop()
    got = {r["event_type"]: r["count"] for r in spark.table("pat_counts").collect()}
    expected = {
        r["event_type"]: r["count"]
        for r in load_table(spark, SF, "events").groupBy("event_type").count().collect()
    }
    assert got == expected


def test_kafka_multi_partition_consume(spark, fake_topic):
    """Multi-partition consumption: the fake transport hash-partitions by
    key into 4 partitions; consuming must cover every partition, keep
    (partition, offset) unique, and preserve per-key partition affinity
    (all records of one key live in one partition — the broker invariant
    co-partitioned joins rely on)."""
    out = ksml(
        ["stream",
         ["kafka", {"subscribe": "events", "fake_dir": fake_topic}],
         ["consumed", ["serde", "String"],
          ["serde", "json", "event_type string, event_id long"]],
         {"stream": False}],
        spark=spark,
    )
    rows = out.df.select("key", "partition", "offset").collect()
    parts = {r["partition"] for r in rows}
    assert parts == {0, 1, 2, 3}  # every partition consumed
    assert len({(r["partition"], r["offset"]) for r in rows}) == len(rows)
    key_parts: dict[str, set] = {}
    for r in rows:
        key_parts.setdefault(r["key"], set()).add(r["partition"])
    assert all(len(ps) == 1 for ps in key_parts.values())


def test_fake_sink_offsets_unique_across_batches(spark, tmp_path):
    """Streaming fake sink over 2+ micro-batches: (partition, offset)
    must stay unique and batch-ordered (review finding: the old
    monotonically_increasing_id collided across batches)."""
    import os

    from pyspark.sql.types import StructType

    sdir, out = str(tmp_path / "src"), str(tmp_path / "sink")
    os.makedirs(sdir)
    for i, fname in enumerate(["b1.json", "b2.json"]):
        with open(os.path.join(sdir, fname), "w") as f:
            for j in range(5):
                f.write(json.dumps({"key": f"k{i}_{j}", "v": j}) + "\n")
        os.utime(os.path.join(sdir, fname), (i + 1, i + 1))
    src = (spark.readStream.schema(StructType.fromDDL("key string, v long"))
           .option("maxFilesPerTrigger", 1).json(sdir))
    from ksml_spark import ksml

    sink = ksml(
        ["to", ["stream", src, {"key": "key"}], "t",
         {"fake_dir": out, "checkpoint": str(tmp_path / "ck"),
          "trigger": "available_now", "output_mode": "append"}],
        spark=spark,
    )
    sink.query.awaitTermination(120)
    rec = spark.read.schema(StructType.fromDDL(KAFKA_RECORD_DDL)).parquet(out)
    rows = rec.select("partition", "offset").collect()
    pairs = [(r["partition"], r["offset"]) for r in rows]
    assert len(pairs) == 10
    assert len(set(pairs)) == 10  # unique per (partition, offset)
    # batch 1 offsets (epoch 1 in high bits) sort after batch 0's
    assert {o >> 32 for _, o in pairs} == {0, 1}
