"""Source operators: :stream, :table, :global-table, :topics, :strs.

Reference: builder ops at /root/reference/src/cddr/ksml/eval.clj:71-73
(stream/table/global-table), :topics eval.clj:82-83, :strs eval.clj:79-80;
forms exercised at eval_test.clj:84-141 (streams), 161-240 (tables),
242-269 (global tables).

Spark-first mapping (SURVEY.md §2.1): a source operand may be

* a DataFrame (batch or streaming) — used as-is;
* an existing Rel — re-wrapped (e.g. table-ify a stream);
* ``["parquet"|"csv"|"json"|"orc"|"text", path]`` — batch file scan (Catalyst pushes
  filters/prunes columns into the scan);
* ``["table-ref", name]`` — ``spark.table`` (catalog / temp view);
* ``["kafka", {options}]`` — Kafka scan (batch ``spark.read`` or streaming
  ``spark.readStream`` with ``stream=True``);
* ``["topics", ...]`` / a topic string / regex — sugar for the Kafka form.

Trailing option dict (the analog of :consumed/:materialized config,
eval.clj:176-180,169-173): ``{"key": col(s), "time": col, "order": cols,
"tombstone": sql_bool, "stream": bool}``.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import ArityError
from ..eval import Ctx, defop
from ..exprs import Serde
from ..model import GlobalKTableRel, KStreamRel, KTableRel, Rel
from .consumed import Consumed, apply_consumed


def _as_tuple(x) -> tuple[str, ...]:
    if x is None:
        return ()
    if isinstance(x, str):
        return (x,)
    return tuple(x)


def _record(ctx: Ctx, **info) -> None:
    """Register a source node on the evaluation context (the Topology's
    source registry — basis of plans.topology introspection)."""
    ctx.sources.append(info)


def _kafka_topics(kopts: dict) -> list[str]:
    if "subscribe" in kopts:
        return [t.strip() for t in str(kopts["subscribe"]).split(",")]
    pat = kopts.get("subscribePattern") or kopts.get("pattern")
    return [str(pat)] if pat else []


def _load_source(ctx: Ctx, src: Any, opts: dict) -> DataFrame:
    """Resolve a source operand to a DataFrame."""
    if isinstance(src, DataFrame):
        _record(ctx, type="dataframe", streaming=src.isStreaming)
        return src
    if isinstance(src, Rel):
        # a pre-built Rel from an earlier ksml() call: carry its sources.
        # keval already merges Rel args' registries (with dedup) before
        # the op runs, so only append what it hasn't seen — otherwise
        # plans.topology double-counts sources for forms like [stream rel]
        for s in getattr(src, "topology_sources", [{"type": "rel"}]):
            if s not in ctx.sources:
                ctx.sources.append(s)
        return src.df
    if isinstance(src, (list, tuple)) and src and isinstance(src[0], str):
        kind = src[0].lstrip(":").lower()
        if kind in ("parquet", "csv", "json", "orc", "text"):
            _record(ctx, type=kind, path=src[1], streaming=bool(opts.get("stream")))
            if kind == "parquet" and not opts.get("stream"):
                from ..sources.files import read_parquet

                return read_parquet(ctx.spark, src[1])
            reader = ctx.spark.readStream if opts.get("stream") else ctx.spark.read
            if kind == "csv":
                return reader.option("header", "true").option("inferSchema", "true").csv(src[1])
            return getattr(reader, kind)(src[1])
        if kind == "table-ref":
            _record(ctx, type="table", name=src[1])
            return ctx.spark.table(src[1])
        if kind == "kafka":
            from ..sources.kafka import kafka_source

            kopts = src[1] if len(src) > 1 else {}
            _record(ctx, type="kafka", topics=_kafka_topics(kopts),
                    streaming=bool(opts.get("stream", True)))
            return kafka_source(ctx.spark, kopts, opts)
    if isinstance(src, str):
        # a topic name / pattern -> Kafka source
        from ..sources.kafka import kafka_source

        _record(ctx, type="kafka", topics=[src], streaming=bool(opts.get("stream", True)))
        return kafka_source(ctx.spark, {"subscribe": src}, opts)
    if isinstance(src, list) and all(isinstance(t, str) for t in src):
        from ..sources.kafka import kafka_source

        _record(ctx, type="kafka", topics=list(src), streaming=bool(opts.get("stream", True)))
        return kafka_source(ctx.spark, {"subscribe": ",".join(src)}, opts)
    raise ArityError(f"cannot resolve source operand: {src!r}")


def _split_opts(args) -> tuple[list, dict]:
    """Split trailing config operands (dicts / Consumed) from positionals."""
    pos, opts = [], {}
    for a in args:
        if isinstance(a, Consumed):
            # defensive: a hand-built Consumed(...) may carry Nones
            opts.update({k: v for k, v in a.options.items() if v is not None})
        elif isinstance(a, dict):
            # None-valued keys mean "unset" (the opts_of contract)
            opts.update({k: v for k, v in a.items() if v is not None})
        else:
            pos.append(a)
    return pos, opts


def _tag_op(ctx: Ctx, n0: int, op: str) -> None:
    for s in ctx.sources[n0:]:
        s.setdefault("op", op)


@defop("stream")
def op_stream(ctx: Ctx, src, *rest) -> KStreamRel:
    """[:stream src consumed?] -> KStream (eval.clj:71)."""
    pos, opts = _split_opts(rest)
    n0 = len(ctx.sources)
    df = _load_source(ctx, src, opts)
    _tag_op(ctx, n0, "stream")
    df = apply_consumed(df, opts)
    return KStreamRel(
        df,
        key_cols=_as_tuple(opts.get("key") or ("key" if "key" in df.columns else None)),
        time_col=opts.get("time") or ("event_time" if "event_time" in df.columns else None),
    )


@defop("table")
def op_table(ctx: Ctx, src, *rest) -> KTableRel:
    """[:table src consumed? materialized?] -> KTable (eval.clj:72).

    Builds the latest-per-key changelog view (SURVEY.md §4 item 1): newest
    record per key by (time, order-tiebreak) descending, tombstones (rows
    matching the ``tombstone`` predicate, default: single value column IS
    NULL) dropped. One hash shuffle on the key; at 100 TB this is the same
    cost as any keyed aggregation and AQE handles skew.
    """
    pos, opts = _split_opts(rest)
    n0 = len(ctx.sources)
    df = _load_source(ctx, src, opts)
    _tag_op(ctx, n0, "table")
    df = apply_consumed(df, opts)
    key_cols = _as_tuple(opts.get("key") or ("key" if "key" in df.columns else None))
    time_col = opts.get("time") or ("event_time" if "event_time" in df.columns else None)
    if not key_cols:
        raise ArityError(":table requires key columns (opts {'key': ...})")

    order_cols = _as_tuple(opts.get("order") or ((time_col,) if time_col else ()))
    tomb = opts.get("tombstone")
    tomb_col = F.expr(tomb) if isinstance(tomb, str) else tomb
    if tomb_col is None:
        skip = set(key_cols) | ({time_col} if time_col else set())
        vals = [c for c in df.columns if c not in skip]
        if len(vals) == 1:
            tomb_col = F.col(vals[0]).isNull()

    if opts.get("unique"):
        # caller declares the source is already one-row-per-key (a snapshot,
        # e.g. a dimension table): skip the dedup shuffle entirely
        view = df if tomb_col is None else df.filter(~tomb_col)
        return KTableRel(view, key_cols=key_cols, time_col=time_col)

    if df.isStreaming:
        # streaming KTable: update-mode latest-per-key aggregation (the
        # changelog view); watermark first if configured so state is pruned.
        # The raw changelog rides along for the streaming table-table join
        # (one stateful operator subsumes both views + the join).
        from ..streaming.runtime import latest_by

        if opts.get("retention") and time_col:
            df = df.withWatermark(time_col, opts["retention"])
        order = tuple(order_cols or key_cols)
        view = latest_by(df, key_cols, order, tomb_col)
        return KTableRel(
            view, key_cols=key_cols, time_col=time_col,
            changelog=(df, order, tomb_col),
        )

    if order_cols:
        # max_by over the order tuple: one hash agg with map-side partials
        # (no per-partition sort), identical result to window/row_number
        from ..streaming.runtime import latest_by

        view = latest_by(df, key_cols, order_cols, tomb_col)
    else:
        # no ordering info: arbitrary representative per key
        view = df.dropDuplicates(list(key_cols))
        if tomb_col is not None:
            view = view.filter(~tomb_col)
    return KTableRel(view, key_cols=key_cols, time_col=time_col)


@defop("global-table")
def op_global_table(ctx: Ctx, src, *rest) -> GlobalKTableRel:
    """[:global-table src ...] -> broadcast lookup table (eval.clj:73).

    The replicated-to-every-instance semantics map to a broadcast hint:
    joins against this Rel ship the whole (small) table to every executor
    instead of shuffling the big side.

    Batch sources only: Spark cannot broadcast a live stream, so a
    continuously-updating lookup table is expressed as a streaming
    [:table ...] joined via the stream⋈live-table processor instead
    (streaming/changelog_join.py) — same semantics, keyed state in place
    of replication."""
    t = op_table(ctx, src, *rest)
    if t.df.isStreaming:
        raise ArityError(
            ":global-table needs a batch source (a broadcast cannot update); "
            "for a live lookup table use [:join stream [:table <stream> ...]] "
            "— the stream-table processor keeps the latest value per key"
        )
    return GlobalKTableRel(F.broadcast(t.df), key_cols=t.key_cols, time_col=t.time_col)


@defop("topics")
def op_topics(ctx: Ctx, *names) -> list[str]:
    """[:topics "a" "b"] -> topic list (eval.clj:82-83)."""
    return list(names)


@defop("strs")
def op_strs(ctx: Ctx, *names) -> list[str]:
    """[:strs "a" "b" "c"] -> String[] literal (eval.clj:79-80)."""
    return list(names)
