"""Kafka source/sink builders (SURVEY.md §2.1 — the reference's only
connector; /root/reference/src/cddr/ksml/eval.clj:71-73 sources,
README.md:66-68 sink).

The record schema Spark's Kafka connector produces is exactly the
reference's record model (SURVEY.md §1.1): binary key/value + topic,
partition, offset, timestamp. Serde decode happens in
``operators.consumed.apply_consumed``.

No broker exists in the test container, so these only BUILD the reader/
writer (constructive tests assert on options); execution requires the
spark-sql-kafka package on a real cluster.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def kafka_source(spark: SparkSession, kopts: dict, opts: dict) -> DataFrame:
    """Build a Kafka DataFrame. kopts: subscribe / subscribePattern /
    assign + bootstrap servers; opts may carry stream=False for a batch
    read and startingOffsets from [:offset-reset ...]."""
    stream = opts.get("stream", True)
    reader = (spark.readStream if stream else spark.read).format("kafka")
    reader = reader.option(
        "kafka.bootstrap.servers", kopts.get("bootstrap", opts.get("bootstrap", "localhost:9092"))
    )
    for k in ("subscribe", "subscribePattern", "assign"):
        if k in kopts:
            reader = reader.option(k, kopts[k])
    if "pattern" in kopts:
        reader = reader.option("subscribePattern", kopts["pattern"])
    offsets = kopts.get("startingOffsets") or opts.get("startingOffsets")
    if offsets:
        reader = reader.option("startingOffsets", str(offsets).lower())
    for k, v in kopts.items():
        if k.startswith("kafka."):
            reader = reader.option(k, v)
    return reader.load()


def kafka_sink(df: DataFrame, topic: Optional[str], opts: dict, rel):
    """Write encoded (binary key, binary value) rows to a topic."""
    from ..operators.sinks import SinkResult

    if topic is None:
        raise ValueError("kafka sink needs a topic")
    bootstrap = opts.get("bootstrap", "localhost:9092")
    if df.isStreaming:
        w = (
            df.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("topic", topic)
        )
        if "checkpoint" in opts:
            w = w.option("checkpointLocation", opts["checkpoint"])
        return SinkResult(rel, topic, w.start())
    (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )
    return SinkResult(rel, topic)
