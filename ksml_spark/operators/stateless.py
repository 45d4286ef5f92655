"""Stateless per-record operators (SURVEY.md §2.2).

Reference expansion rules: :filter /root/reference/src/cddr/ksml/eval.clj:107-109,
:filter-not 110-112, :flat-map 113-115, :flat-map-values 116-118,
:foreach 119-121, :map 122-124, :map-values 125-127, :select-key 128-130,
:branch 100-106, :merge 74-76, :to-stream 97-99, :named 77-78,
:peek! (eval_test.clj:495-498), :repartitioned eval.clj:187-198.

All compile to pure DataFrame expressions — narrow (no-shuffle) Catalyst
operators that fuse into whole-stage codegen. Re-keying ops (:map,
:select-key) only update key METADATA; the shuffle happens lazily at the
next keyed operation (exactly Kafka Streams' repartition-topic-on-demand
behavior, but Catalyst gets to plan it).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..errors import ArityError, TypeDispatchError
from ..eval import Ctx, defop
from ..exprs import (
    ForeachAction,
    KeyValueMapper,
    Partitioner,
    Predicate,
    ValueMapper,
    named_cols,
    to_col,
)
from ..model import BranchedRel, GroupedRel, KStreamRel, KTableRel, Rel


@dataclass
class Named:
    """[:named "x"] processor-name metadata (eval.clj:77-78)."""

    name: str


@defop("named")
def op_named(ctx: Ctx, name: str) -> Named:
    return Named(name)


def _absorb_named(rel: Rel, rest) -> Rel:
    for r in rest:
        if isinstance(r, Named):
            rel.name = r.name
    return rel


# ---------------------------------------------------------------------------
# lambda application helpers

def _require_lambda(x, op: str, form: str):
    """Lambda-slot operands must be wrapped lambda forms — a dict/rel/
    number landing here is a DSL usage error and must surface curated,
    not as an AttributeError on the missing wrapper API."""
    from ..exprs import Lambda

    if not isinstance(x, Lambda):
        raise TypeDispatchError(
            f"{op} needs a [{form!r}, fn] lambda form, got {type(x).__name__}"
        )


def predicate_condition(rel: Rel, pred: Predicate) -> Column:
    """Compile a :predicate to a boolean Column over rel's record model."""
    _require_lambda(pred, "filter", "predicate")
    if pred.is_sql():
        return F.expr(pred.fn)
    if pred.opaque:
        udf = Predicate(pred.fn, opaque=True, returns="boolean").as_pandas_udf()
        return udf(rel.key_expr(), rel.value_expr())
    return to_col(pred.fn(rel.key_expr(), rel.value_expr()))


def value_result(rel: Rel, vm: ValueMapper, default_name: str = "value") -> dict[str, Column]:
    """Compile a :value-mapper into named output Columns."""
    _require_lambda(vm, "map-values/flat-map-values", "value-mapper")
    if vm.is_sql():
        return {default_name: F.expr(vm.fn)}
    if isinstance(vm.fn, dict):
        return named_cols(vm.fn, default_name)
    if vm.opaque:
        udf = ValueMapper(vm.fn, opaque=True, returns=vm.returns or "string").as_pandas_udf()
        return {default_name: udf(rel.value_expr())}
    return named_cols(vm.fn(rel.value_expr()), default_name)


def kv_result(rel: Rel, km: KeyValueMapper) -> tuple[dict[str, Column], dict[str, Column]]:
    """Compile a :key-value-mapper into (key columns, value columns)."""
    _require_lambda(km, "map/flat-map", "key-value-mapper")
    if isinstance(km.fn, dict):
        if set(km.fn) >= {"key"}:
            kd = named_cols(km.fn["key"], "key")
            vd = named_cols(km.fn.get("value", rel.value_expr()), "value")
            return kd, vd
        raise ArityError("dict key-value-mapper needs a 'key' entry")
    if km.is_sql():
        # SQL string = new-key expression, value unchanged
        return {"key": F.expr(km.fn)}, {c: F.col(c) for c in rel.value_col_names()}
    if km.opaque:
        raise TypeDispatchError(
            "opaque key-value-mapper: use ['map', s, ['key-value-mapper', f]] with a "
            "Column-level callable, or a py-value-mapper plus select-key"
        )
    out = km.fn(rel.key_expr(), rel.value_expr())
    if isinstance(out, (tuple, list)) and len(out) == 2:
        return named_cols(out[0], "key"), named_cols(out[1], "value")
    if isinstance(out, dict):
        return named_cols(out.get("key"), "key"), named_cols(out.get("value"), "value")
    raise ArityError("key-value-mapper must return (key, value) or {'key':..,'value':..}")


def key_result(rel: Rel, km: KeyValueMapper) -> dict[str, Column]:
    """Compile a key-only mapper (for :select-key / :group-by)."""
    _require_lambda(km, "select-key/group-by", "key-value-mapper")
    if km.is_sql():
        return {"key": F.expr(km.fn)}
    if isinstance(km.fn, dict):
        return named_cols(km.fn, "key")
    if km.opaque:
        udf = KeyValueMapper(km.fn, opaque=True, returns=km.returns or "string").as_pandas_udf()
        return {"key": udf(rel.key_expr(), rel.value_expr())}
    return named_cols(km.fn(rel.key_expr(), rel.value_expr()), "key")


def _rebuild(rel: Rel, keys: dict[str, Column], vals: dict[str, Column]) -> DataFrame:
    """Project to (keys + values + time), preserving the time column."""
    cols = [c.alias(n) for n, c in keys.items()]
    cols += [c.alias(n) for n, c in vals.items() if n not in keys]
    if rel.time_col and rel.time_col not in keys and rel.time_col not in vals:
        cols.append(F.col(rel.time_col))
    return rel.df.select(*cols)


# ---------------------------------------------------------------------------
# the operators

@defop("filter")
def op_filter(ctx: Ctx, rel: Rel, pred: Predicate, *rest) -> Rel:
    """[:filter s [:predicate f]] — keep records where (pred k v)
    (eval.clj:107-109; stream eval_test.clj:379-382, table 298-304)."""
    out = rel.with_df(rel.df.filter(predicate_condition(rel, pred)))
    return _absorb_named(out, rest)


@defop("filter-not")
def op_filter_not(ctx: Ctx, rel: Rel, pred: Predicate, *rest) -> Rel:
    """[:filter-not s [:predicate f]] (eval.clj:110-112)."""
    out = rel.with_df(rel.df.filter(~predicate_condition(rel, pred)))
    return _absorb_named(out, rest)


@defop("map")
def op_map(ctx: Ctx, rel: Rel, km: KeyValueMapper, *rest) -> KStreamRel:
    """[:map s [:key-value-mapper f]] — re-key + re-value (eval.clj:122-124,
    anomaly_detection.clj:32-34). Marks the stream re-keyed; the shuffle
    happens at the next keyed op, planned by Catalyst."""
    keys, vals = kv_result(rel, km)
    df = _rebuild(rel, keys, vals)
    out = KStreamRel(df, key_cols=tuple(keys), time_col=rel.time_col if rel.time_col in df.columns else None)
    return _absorb_named(out, rest)


@defop("map-values")
def op_map_values(ctx: Ctx, rel: Rel, vm: ValueMapper, *rest) -> Rel:
    """[:map-values s [:value-mapper f]] — value-only transform, key and
    partitioning preserved (eval.clj:125-127; table eval_test.clj:340-346)."""
    vals = value_result(rel, vm)
    keys = {c: F.col(c) for c in rel.key_cols}
    out = rel.with_df(_rebuild(rel, keys, vals))
    return _absorb_named(out, rest)


@defop("select-key")
def op_select_key(ctx: Ctx, rel: Rel, km: KeyValueMapper, *rest) -> KStreamRel:
    """[:select-key s [:key-value-mapper f]] — re-key only (eval.clj:128-130)."""
    keys = key_result(rel, km)
    drop = [c for c in rel.key_cols if c not in keys]
    df = rel.df
    for n, c in keys.items():
        df = df.withColumn(n, c)
    if drop:
        df = df.drop(*drop)
    out = KStreamRel(df, key_cols=tuple(keys), time_col=rel.time_col)
    return _absorb_named(out, rest)


@defop("flat-map")
def op_flat_map(ctx: Ctx, rel: Rel, km: KeyValueMapper, *rest) -> KStreamRel:
    """[:flat-map s [:key-value-mapper f]] — one record -> 0..n [k v] pairs
    (eval.clj:113-115). The mapper must return an ARRAY column of
    struct<key,value>; we explode it (generator stays in codegen)."""
    _require_lambda(km, "flat-map", "key-value-mapper")
    if km.is_sql():
        arr = F.expr(km.fn)
    elif km.opaque:
        udf = KeyValueMapper(
            km.fn, opaque=True, returns=km.returns or "array<struct<key:string,value:string>>"
        ).as_pandas_udf()
        arr = udf(rel.key_expr(), rel.value_expr())
    else:
        arr = to_col(km.fn(rel.key_expr(), rel.value_expr()))
    df = rel.df.select(
        F.explode(arr).alias("__kv"),
        *([F.col(rel.time_col)] if rel.time_col else []),
    ).select("__kv.*", *([rel.time_col] if rel.time_col else []))
    out = KStreamRel(df, key_cols=("key",), time_col=rel.time_col)
    return _absorb_named(out, rest)


@defop("flat-map-values")
def op_flat_map_values(ctx: Ctx, rel: Rel, vm: ValueMapper, *rest) -> KStreamRel:
    """[:flat-map-values s [:value-mapper f]] — one value -> 0..n values,
    key preserved (eval.clj:116-118; wordcount README.md:62). The mapper
    returns an ARRAY column; exploded with the key carried along."""
    _require_lambda(vm, "flat-map-values", "value-mapper")
    pos = [r for r in rest if isinstance(r, dict)]
    out_name = (pos[0].get("as") if pos else None) or "value"
    if vm.is_sql():
        arr = F.expr(vm.fn)
    elif vm.opaque:
        udf = ValueMapper(vm.fn, opaque=True, returns=vm.returns or "array<string>").as_pandas_udf()
        arr = udf(rel.value_expr())
    else:
        arr = to_col(vm.fn(rel.value_expr()))
    keep = [F.col(c) for c in rel.key_cols]
    if rel.time_col:
        keep.append(F.col(rel.time_col))
    df = rel.df.select(*keep, F.explode(arr).alias(out_name))
    out = KStreamRel(df, key_cols=rel.key_cols, time_col=rel.time_col)
    return _absorb_named(out, rest)


@defop("branch")
def op_branch(ctx: Ctx, rel: Rel, *rest) -> BranchedRel:
    """[:branch s pred...] — split into N streams by ordered predicates,
    first match wins (eval.clj:100-106; eval_test.clj:371-377).

    N filtered plans over one scan; Catalyst reuses the scan (batch) /
    the source (streaming). Record goes to the FIRST matching branch:
    branch_i = p_i AND NOT any(p_0..p_{i-1}).
    """
    preds = [r for r in rest if isinstance(r, Predicate)]
    if not preds:
        raise ArityError(":branch needs at least one [:predicate f]")
    branches = []
    prior: Optional[Column] = None
    for p in preds:
        cond = predicate_condition(rel, p)
        eff = cond if prior is None else (cond & ~prior)
        branches.append(KStreamRel(rel.df.filter(eff), key_cols=rel.key_cols, time_col=rel.time_col))
        prior = cond if prior is None else (prior | cond)
    return BranchedRel(branches)


@defop("merge")
def op_merge(ctx: Ctx, first: Rel, *others) -> KStreamRel:
    """[:merge s1 s2 ...] — union N streams (eval.clj:74-76). unionByName
    keeps schema alignment explicit; no shuffle (narrow)."""
    df = first.df
    for o in others:
        if isinstance(o, Rel):
            df = df.unionByName(o.df, allowMissingColumns=False)
    return KStreamRel(df, key_cols=first.key_cols, time_col=first.time_col)


@defop("to-stream")
def op_to_stream(ctx: Ctx, table: Rel, *rest) -> KStreamRel:
    """[:to-stream table kv-mapper?] — KTable changelog -> KStream
    (eval.clj:97-99; eval_test.clj:357-367, anomaly_detection.clj:42).
    Batch: the current view as an append stream (identity). Optional
    re-key mapper applied after."""
    out = KStreamRel(table.df, key_cols=table.key_cols, time_col=table.time_col)
    for r in rest:
        if isinstance(r, KeyValueMapper):
            out = op_map(ctx, out, r)
    return _absorb_named(out, rest)


@defop("peek", retype_value_errors=False)
def op_peek(ctx: Ctx, rel: Rel, action: ForeachAction, *rest) -> Rel:
    """[:peek! s [:foreach-action f]] — side-effect tap, stream passes
    through (eval_test.clj:495-498). Implemented with df.observe (metrics,
    no extra pass) when the action is an aggregate expr; opaque actions run
    via foreachBatch in streaming — in batch we apply per-partition without
    materializing."""
    _require_lambda(action, "peek", "foreach-action")
    if isinstance(action.fn, str):
        out = rel.with_df(rel.df.observe(f"peek_{id(action) % 10_000}", F.expr(action.fn)))
        return _absorb_named(out, rest)
    # opaque side effect: Arrow-batched executor-side tap, plan passes through
    fn = action.fn

    def _tap(batches):
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                fn(row)
            yield pdf

    out = rel.with_df(rel.df.mapInPandas(_tap, rel.df.schema))
    return _absorb_named(out, rest)


@defop("repartitioned", "repartition")
def op_repartitioned(ctx: Ctx, rel: Rel, *rest) -> Rel:
    """[:repartitioned s n? [:partitioner f]?] (eval.clj:187-198) —
    explicit repartition by key (or custom partition expression)."""
    n = next((r for r in rest if isinstance(r, int)), None)
    part = next((r for r in rest if isinstance(r, Partitioner)), None)
    if part is not None:
        expr = (
            F.expr(part.fn)
            if part.is_sql()
            else to_col(part.fn(rel.key_expr(), rel.value_expr()))
        )
        df = rel.df.repartition(n, expr) if n else rel.df.repartition(expr)
    elif rel.key_cols:
        cols = [F.col(c) for c in rel.key_cols]
        df = rel.df.repartition(n, *cols) if n else rel.df.repartition(*cols)
    else:
        df = rel.df.repartition(n) if n else rel.df
    return rel.with_df(df)
