"""Serving layer: materialize a relation and answer point lookups
(SURVEY.md §2.8 — the reference's interactive queries).

Reference: /root/reference/src/cddr/ksml/ring.clj:20-53 — a ring handler
that routes a key lookup to whichever Kafka Streams instance hosts that
key's state store (find-host → local-or-forward). Spark has no
per-instance state ownership to route around: the materialized view IS
queryable from the driver, and Catalyst prunes the scan to the matching
rows. So the Spark-first parity surface is a handle over the
materialized table:

    h = ksml(["serve", rel, {"name": "counts"}], spark=spark)
    h.lookup("alice")                      # single-column key
    h.lookup({"window_start": ..., "event_type": "click"})  # composite
    h.all(); h.refresh(); h.stop()

* batch rel: registered as a temp view (re-resolved per lookup).
* streaming rel: a memory-sink query — "complete" output for aggregated
  tables (each trigger replaces the snapshot, so lookups always see a
  consistent latest state), "append" for plain streams. ``trigger``
  option defaults to availableNow (deterministic in tests); pass e.g.
  {"trigger": "5 seconds"} for a continuously-refreshing serving copy.

Scale note: the memory sink collects the materialized view to the
driver, which is exactly what a serving copy of an aggregate is — O(keys)
not O(events). For beyond-driver-memory serving, sink to a bucketed
catalog table instead (operators/sinks.py) and point lookups prune to
one bucket.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession

from ..errors import ArityError
from ..eval import Ctx, defop
from ..model import KTableRel, Rel


@dataclass
class ServeHandle:
    """Queryable handle over a materialized relation."""

    spark: SparkSession
    name: str
    key_cols: tuple[str, ...]
    query: Any = None  # StreamingQuery when the rel was streaming

    def df(self) -> DataFrame:
        return self.spark.table(self.name)

    def all(self) -> list:
        return self.df().collect()

    def lookup(self, key) -> list:
        """Rows for one key. ``key``: a scalar (single-column key), a
        tuple (positional composite), or a {col: value} dict."""
        df = self.df()
        if isinstance(key, dict):
            items = key.items()
        elif isinstance(key, (list, tuple)):
            if len(key) != len(self.key_cols):
                raise ArityError(f"lookup expects {len(self.key_cols)} key parts, got {len(key)}")
            items = zip(self.key_cols, key)
        else:
            if len(self.key_cols) != 1:
                raise ArityError(f"composite key {self.key_cols}: pass a dict or tuple")
            items = [(self.key_cols[0], key)]
        for col, val in items:
            df = df.filter(df[col] == val)
        return df.collect()

    def refresh(self) -> "ServeHandle":
        """Streaming handles: block until everything currently available
        at the source has been processed into the serving table."""
        if self.query is not None:
            if not self.query.isActive:
                # availableNow queries terminate; a fresh lookup needs a new run
                raise ArityError(
                    "availableNow serve query already finished; re-evaluate "
                    "['serve', ...] to snapshot new data"
                )
            self.query.processAllAvailable()
        return self

    def stop(self) -> None:
        if self.query is not None and self.query.isActive:
            self.query.stop()


@defop("serve")
def op_serve(ctx: Ctx, rel: Rel, *rest) -> ServeHandle:
    """["serve", rel, {"name": ..., "key": cols?, "trigger": ...,
    "output_mode": ...}] — materialize + return a lookup handle."""
    opts: dict = {}
    for r in rest:
        if isinstance(r, dict):
            opts.update(r)
    name = opts.get("name") or rel.name
    if not name:
        raise ArityError("serve needs {'name': ...}")
    key = opts.get("key")
    if isinstance(key, str):  # a bare column name is a 1-column key
        key = (key,)
    key_cols = tuple(key or rel.key_cols)
    if not key_cols:
        raise ArityError("serve needs key columns (keyed rel or {'key': cols})")

    if not rel.df.isStreaming:
        rel.df.createOrReplaceTempView(name)
        return ServeHandle(ctx.spark, name, key_cols)

    # streaming: memory sink. Aggregated tables serve a full consistent
    # snapshot per trigger (complete); plain streams append.
    mode = opts.get("output_mode") or (
        "complete" if isinstance(rel, KTableRel) else "append"
    )
    w = rel.df.writeStream.format("memory").queryName(name).outputMode(mode)
    trig = opts.get("trigger", "available_now")
    if trig == "available_now":
        w = w.trigger(availableNow=True)
    elif trig:
        w = w.trigger(processingTime=trig)
    if "checkpoint" in opts:
        w = w.option("checkpointLocation", opts["checkpoint"])
    q = w.start()
    if trig == "available_now":
        q.awaitTermination(float(opts.get("timeout", 120.0)))
    return ServeHandle(ctx.spark, name, key_cols, query=q)
