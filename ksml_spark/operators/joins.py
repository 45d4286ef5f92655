"""Joins (SURVEY.md §2.3).

Reference: :join /root/reference/src/cddr/ksml/eval.clj:133-135,
:left-join eval.clj:137-139, :outer-join eval.clj:141-143, applied
polymorphically to table⋈table (eval_test.clj:322-355), stream⋈stream
windowed (eval_test.clj:433-444, [:join-window 1000] eval_test.clj:40),
stream⋈table (eval_test.clj:446-450), and stream⋈global-table via
key-extractor (eval_test.clj:428-431,452-455).

All reference joins are EQUI-joins on the record key (Kafka Streams
co-partitioning). Spark picks broadcast / shuffled-hash / sort-merge
automatically, AQE re-picks at runtime:

* table⋈table, stream⋈table — plain keyed join.
* stream⋈global-table — key-extractor equality against a broadcast side.
* stream⋈stream + join-window — keyed join AND an event-time band
  |l.ts − r.ts| ≤ reach. In streaming this is exactly Spark's
  interval join (state pruned by watermark); in batch Catalyst plans the
  equi-key part as the join key and the band as a post-filter — no
  cross product.

The :value-joiner (eval.clj:255-258) runs as a post-join projection.
Dsl extensions beyond the reference (free on Spark): "left_semi",
"left_anti" join kinds.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..errors import ArityError, TypeDispatchError
from .util import opts_of
from ..eval import Ctx, defop
from ..exprs import KeyValueMapper, ValueJoiner, named_cols, to_col
from ..model import GlobalKTableRel, GroupedRel, KStreamRel, KTableRel, Rel, WindowSpec
from .stateless import Named


def _disambiguate(left: Rel, right: Rel) -> tuple[DataFrame, DataFrame, dict, dict]:
    """Rename collision columns (except join keys when identical) with
    l_/r_ prefixes so the joined schema is unambiguous."""
    lcols, rcols = set(left.df.columns), set(right.df.columns)
    shared = (lcols & rcols) - set()
    lmap = {c: c for c in left.df.columns}
    rmap = {c: c for c in right.df.columns}
    rdf = right.df
    ldf = left.df
    for c in shared:
        rmap[c] = f"r_{c}"
        rdf = rdf.withColumnRenamed(c, f"r_{c}")
    return ldf, rdf, lmap, rmap


def _key_condition(left: Rel, right: Rel, ldf: DataFrame, rdf: DataFrame, rmap: dict) -> Column:
    lk, rk = left.key_cols, right.key_cols
    if not lk or not rk:
        raise ArityError("join requires key columns on both sides")
    if len(lk) != len(rk):
        raise ArityError(f"key arity mismatch: {lk} vs {rk}")
    cond = None
    for a, b in zip(lk, rk):
        c = ldf[a] == rdf[rmap[b]]
        cond = c if cond is None else (cond & c)
    return cond


def _apply_joiner(
    joined: DataFrame, left: Rel, right: Rel, rmap: dict, vj: Optional[ValueJoiner], how: str
) -> DataFrame:
    if vj is None or vj.fn is None:
        return joined
    if vj.is_sql():
        out = named_cols(vj.fn, "value")
    else:
        lvals = list(left.value_col_names())
        rvals = list(right.value_col_names())
        lv = F.col(lvals[0]) if len(lvals) == 1 else F.struct(*[F.col(c).alias(c) for c in lvals])
        # struct fields keep the ORIGINAL right-side names so the
        # value-joiner sees the reference's record model, not the
        # disambiguation prefixes
        rv = (
            F.col(rmap[rvals[0]])
            if len(rvals) == 1
            else F.struct(*[F.col(rmap[c]).alias(c) for c in rvals])
        )
        out = named_cols(vj.fn(lv, rv), "value")
    keys = [F.col(c) for c in left.key_cols] if how != "right" else [F.col(rmap[c]) for c in right.key_cols]
    keep = keys + [c.alias(n) for n, c in out.items()]
    if left.time_col and left.time_col in joined.columns:
        keep.append(F.col(left.time_col))
    return joined.select(*keep)


def _do_join(ctx: Ctx, left: Rel, right: Rel, how: str, rest) -> Rel:
    # (pre-built Rel operands' source registries are merged by keval)
    for side, name in ((left, "left"), (right, "right")):
        if not isinstance(side, Rel):
            raise TypeDispatchError(
                f"join {name} operand must be a stream/table, got {type(side).__name__}"
            )
    vj = next((r for r in rest if isinstance(r, ValueJoiner)), None)
    window = next((r for r in rest if isinstance(r, WindowSpec)), None)
    kx = next((r for r in rest if isinstance(r, KeyValueMapper)), None)

    if (
        isinstance(left, KTableRel)
        and isinstance(right, KTableRel)
        and not isinstance(right, GlobalKTableRel)
        and left.df.isStreaming
        and right.df.isStreaming
        and how in ("inner", "left", "full_outer")
    ):
        # both-sides-updating changelog join: one stateful operator over
        # the raw changelogs (Spark refuses joins of two aggregated
        # streams). Emits all columns; apply projections after the join.
        from ..streaming.changelog_join import changelog_join

        if vj is not None and vj.fn is not None:
            raise TypeDispatchError(
                "streaming table-table join emits all columns; apply the "
                "value-joiner as a map-values/select AFTER the join"
            )
        return changelog_join(left, right, how)

    if (
        isinstance(left, KStreamRel)
        and isinstance(right, KTableRel)
        and not isinstance(right, GlobalKTableRel)
        and left.df.isStreaming
        and right.df.isStreaming
        and window is None
        and how in ("inner", "left")
    ):
        # stream ⋈ LIVE table: Spark refuses append-stream ⋈ aggregated
        # stream, so this is the latest-right stateful lookup processor.
        from ..streaming.changelog_join import stream_table_join

        if vj is not None and vj.fn is not None:
            raise TypeDispatchError(
                "streaming stream-table join emits all columns; apply the "
                "value-joiner as a map-values/select AFTER the join"
            )
        return stream_table_join(left, right, how)

    if (
        isinstance(right, KTableRel)
        and not isinstance(right, GlobalKTableRel)
        and left.df.isStreaming
        and right.df.isStreaming
    ):
        # remaining streaming ⋈ live-table combos (outer/semi/anti, or a
        # windowed form) would otherwise die inside Spark with its
        # internal "join between streaming aggregations" error
        raise TypeDispatchError(
            f"streaming join how={how!r} against a LIVE table is not "
            "supported: table-table supports inner/left/full_outer, "
            "stream-table supports inner/left (no window). Snapshot the "
            "table to batch, or restructure via the stateful processor."
        )

    ldf, rdf, lmap, rmap = _disambiguate(left, right)

    opts = opts_of(rest)
    hint = opts.get("hint")
    if hint is not None:
        # physical-strategy hint on the RIGHT side — the 100 TB tuning
        # knob when Catalyst's size estimates are wrong (a dimension
        # table behind a filter it can't estimate, a pre-shuffled side
        # where sort-merge's sort is wasted). Catalyst still validates
        # applicability; an inapplicable hint is ignored, never wrong.
        allowed = {
            "broadcast": "broadcast",
            "merge": "merge",
            "shuffle_hash": "shuffle_hash",
            "shuffle_replicate_nl": "shuffle_replicate_nl",
        }
        if hint not in allowed:
            raise ArityError(
                f"join hint must be one of {sorted(allowed)}, got {hint!r}"
            )
        rdf = rdf.hint(allowed[hint])

    if isinstance(right, GlobalKTableRel):
        # stream⋈global-table: key-extractor on the stream side, broadcast
        # right (eval_test.clj:428-431). No shuffle of the stream at all.
        if kx is not None:
            kexpr = (
                F.expr(kx.fn)
                if kx.is_sql()
                else to_col(kx.fn(left.key_expr(), left.value_expr()))
            )
        else:
            kexpr = left.key_expr()
        rk = right.key_cols
        cond = kexpr == rdf[rmap[rk[0]]]
        joined = ldf.join(F.broadcast(rdf), cond, "inner" if how == "inner" else "left")
    else:
        cond = _key_condition(left, right, ldf, rdf, rmap)
        stream_stream = isinstance(left, KStreamRel) and isinstance(right, KStreamRel)
        if stream_stream and window is not None:
            # interval join: key equality + event-time band
            lt, rt = left.time_col, rmap.get(right.time_col)
            if not lt or not rt:
                raise TypeDispatchError("windowed stream-stream join needs time columns")
            reach = window.size
            if ldf.isStreaming and rdf.isStreaming:
                # watermarks bound the join state on both sides (Spark's
                # stream-stream interval join requirement); grace defaults
                # to the join reach
                delay = window.grace or reach
                ldf = ldf.withWatermark(lt, delay)
                rdf = rdf.withWatermark(rt, delay)
            band = (F.col(rt) >= F.col(lt) - F.expr(f"INTERVAL {reach}")) & (
                F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {reach}")
            )
            cond = cond & band
        joined = ldf.join(rdf, cond, how)

    if how == "full_outer":
        # Reference outer-join always carries the record key (Kafka Streams
        # repartitions both sides to the same key space). Right-only rows
        # would otherwise surface NULL left keys: coalesce the two key
        # columns into the left name and drop the right copy.
        rkeys = [rmap[b] for b in right.key_cols]
        coalesced = [
            F.coalesce(F.col(a), F.col(rb)).alias(a)
            for a, rb in zip(left.key_cols, rkeys)
        ]
        others = [
            F.col(c)
            for c in joined.columns
            if c not in set(left.key_cols) and c not in set(rkeys)
        ]
        joined = joined.select(*coalesced, *others)

    out_cls = KTableRel if isinstance(left, KTableRel) and isinstance(right, KTableRel) else KStreamRel
    joined = _apply_joiner(joined, left, right, rmap, vj, how)
    return out_cls(joined, key_cols=left.key_cols, time_col=left.time_col if (left.time_col and left.time_col in joined.columns) else None)


@defop("join")
def op_join(ctx: Ctx, left: Rel, right: Rel, *rest) -> Rel:
    """[:join l r [:value-joiner f] opts...] — inner join on key
    (eval.clj:133-135)."""
    return _do_join(ctx, left, right, "inner", rest)


@defop("left-join")
def op_left_join(ctx: Ctx, left: Rel, right: Rel, *rest) -> Rel:
    """[:left-join l r [:value-joiner f]] — left outer (eval.clj:137-139)."""
    return _do_join(ctx, left, right, "left", rest)


@defop("outer-join")
def op_outer_join(ctx: Ctx, left: Rel, right: Rel, *rest) -> Rel:
    """[:outer-join l r [:value-joiner f]] — full outer (eval.clj:141-143)."""
    return _do_join(ctx, left, right, "full_outer", rest)


@defop("semi-join")
def op_semi_join(ctx: Ctx, left: Rel, right: Rel, *rest) -> Rel:
    """DSL extension (SURVEY.md §2.3: 'semi/anti come free'): EXISTS join."""
    return _do_join(ctx, left, right, "left_semi", rest)


@defop("anti-join")
def op_anti_join(ctx: Ctx, left: Rel, right: Rel, *rest) -> Rel:
    """DSL extension: NOT EXISTS join."""
    return _do_join(ctx, left, right, "left_anti", rest)


@defop("asof-join")
def op_asof_join(ctx: Ctx, left: Rel, right: Rel, *rest) -> KStreamRel:
    """["asof-join", l, r, {"order": right-tiebreak-cols,
    "tolerance": seconds?}] — for each left record, the most recent right
    record with r.time <= l.time on the same key (left-join semantics:
    right columns null when no prior record). With "tolerance", matches
    older than that many seconds are nulled atomically (the merge_asof
    staleness bound — a quote from last week should not fill a trade).

    Not in the reference (its nearest analog is the stream⋈KTable lookup,
    SURVEY.md §2.3 note); this is the temporal-join extension a telemetry /
    training-data pipeline needs.

    Spark-first plan: tag both sides, union, then per-key ordered window
    with last(ignorenulls) over (time, side, tiebreak) — ONE shuffle +
    sort on the key, linear in rows. The naive formulation (band join +
    max_by per left row) explodes on key cardinality; this never does.
    Right rows sort before left rows at equal timestamps, so the match is
    inclusive (r.time <= l.time)."""
    for side, name in ((left, "left"), (right, "right")):
        if not isinstance(side, Rel):
            raise TypeDispatchError(
                f"asof-join {name} operand must be a stream/table, got {type(side).__name__}"
            )
    from pyspark.sql import Window

    opts = opts_of(rest)
    lk, rk = left.key_cols, right.key_cols
    lt, rt = left.time_col, right.time_col
    if not (lk and rk and lt and rt):
        raise TypeDispatchError("asof-join needs keys and time columns on both sides")

    lcols = left.df.columns
    rvals = [c for c in right.df.columns if c not in rk and c != rt]
    rmap = {c: (f"r_{c}" if c in lcols else c) for c in rvals}
    rdf = right.df
    for a, b in zip(rk, lk):
        if a != b:
            rdf = rdf.withColumnRenamed(a, b)
    if rt != lt:
        rdf = rdf.withColumnRenamed(rt, lt)
    for c, n in rmap.items():
        if c != n:
            rdf = rdf.withColumnRenamed(c, n)
    out_rvals = list(rmap.values())
    lvals = [c for c in lcols if c not in lk and c != lt]

    from pyspark.sql.types import StructField, StructType

    rschema = {f.name: f.dataType for f in rdf.schema.fields}
    lschema = {f.name: f.dataType for f in left.df.schema.fields}
    # All right value columns travel as ONE struct: last(struct,
    # ignorenulls) then picks the matched right row atomically. Filling
    # each column independently would back-fill a genuinely-NULL field of
    # the matched row from an older right row — a row that never existed.
    tolerance = opts.get("tolerance")
    if tolerance is not None and float(tolerance) < 0:
        raise ArityError(f"asof-join tolerance must be >= 0 seconds, got {tolerance!r}")
    # with a tolerance the matched right row's TIME must travel in the
    # struct too, so the staleness check inspects the actual match
    struct_fields = list(out_rvals) + (["__rt"] if tolerance is not None else [])
    rstruct_type = StructType(
        [StructField(n, rschema.get(n, rschema[lt]) if n != "__rt" else rschema[lt])
         for n in struct_fields]
    )
    l_tagged = left.df.select(
        *lk, F.col(lt), F.lit(1).alias("__side"), *lvals,
        F.lit(None).cast(rstruct_type).alias("__rvals"),
    )
    r_struct_cols = [F.col(n) for n in out_rvals] + (
        [F.col(lt).alias("__rt")] if tolerance is not None else []
    )
    r_tagged = rdf.select(
        *lk, F.col(lt), F.lit(0).alias("__side"),
        *[F.lit(None).cast(lschema[c]).alias(c) for c in lvals],
        F.struct(*r_struct_cols).alias("__rvals"),
    )
    u = l_tagged.unionByName(r_tagged)

    tiebreaks = opts.get("order") or []
    if isinstance(tiebreaks, str):
        tiebreaks = [tiebreaks]
    order = [F.col(lt).asc(), F.col("__side").asc()] + [
        F.col("__rvals")[rmap.get(c, c)].asc_nulls_first() for c in tiebreaks
    ]
    w = (
        Window.partitionBy(*[F.col(c) for c in lk])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *lk, F.col(lt), F.col("__side"), *lvals,
        F.last("__rvals", ignorenulls=True).over(w).alias("__rvals"),
    )
    if tolerance is not None:
        # the match expires when the left record is more than `tolerance`
        # seconds after it — null ALL right columns together (the struct
        # is atomic, so a stale match can't leak single fields)
        fresh = (
            F.col(lt).cast("double")
            - F.col("__rvals")["__rt"].cast("double")
        ) <= float(tolerance)
        rpick = [
            F.when(fresh, F.col("__rvals")[n]).alias(n) for n in out_rvals
        ]
    else:
        rpick = [F.col("__rvals")[n].alias(n) for n in out_rvals]
    out = filled.filter(F.col("__side") == 1).select(
        *lk, F.col(lt), *lvals, *rpick,
    )
    return KStreamRel(out, key_cols=lk, time_col=lt)


@defop("join-global")
def op_join_global(ctx: Ctx, left: Rel, gtable: Rel, *rest) -> Rel:
    """[:join-global s gt [:key-value-mapper kx] [:value-joiner vj]]
    (eval_test.clj:428-431) — non-co-partitioned broadcast lookup join."""
    if not isinstance(gtable, GlobalKTableRel):
        raise TypeDispatchError(":join-global requires a [:global-table ...] right side")
    return _do_join(ctx, left, gtable, "inner", rest)


@defop("left-join-global")
def op_left_join_global(ctx: Ctx, left: Rel, gtable: Rel, *rest) -> Rel:
    """[:left-join-global s gt kx vj] (eval_test.clj:452-455)."""
    if not isinstance(gtable, GlobalKTableRel):
        raise TypeDispatchError(":left-join-global requires a [:global-table ...] right side")
    return _do_join(ctx, left, gtable, "left", rest)
