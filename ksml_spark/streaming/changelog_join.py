"""Streaming KTable ⋈ KTable changelog join — both sides live-updating.

Reference semantics: :join/:left-join/:outer-join applied to two tables
(/root/reference/src/cddr/ksml/eval.clj:133-143, eval_test.clj:322-355):
each side is a changelog, the join output updates whenever EITHER side's
latest value for a key changes, and a side losing its value (tombstone)
retracts or downgrades the output row.

Spark can't express this natively: the KTable view is an update-mode
aggregation (latest_by), and Structured Streaming refuses joins between
two aggregated streams. The Spark-first alternative is ONE stateful
operator that subsumes both views and the join (SURVEY.md §7 "hard/risky"
(a)): union the two RAW changelogs with a side tag, group by key, and run
``applyInPandasWithState`` keeping (latest-left, latest-right) per key —
exactly Kafka Streams' two-store join processor, expressed as Spark
state. One shuffle on the key, state = two packed rows per key.

Emission (update mode): after each micro-batch touching a key, emit the
current joined row when the join predicate holds (inner: both sides
present; left: left present; full_outer: either present); emit an
all-NULL-values retraction row when it held before and stopped holding.
``__seq`` (count of changelog records consumed for the key) orders
emissions, so "final state" = the row with max ``__seq`` per key.

Scale: identical shuffle shape to any keyed aggregation — the union is
map-side, the single exchange is on the join key, state is O(distinct
keys) with two value structs each, pruned by the state store's own
watermark/TTL config. No second stateful operator, no stream-stream
buffering of full histories.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..errors import TypeDispatchError
from ..model import KStreamRel, KTableRel


def _ord_ge(a, b) -> bool:
    """Order-tuple a >= b with NULL/NaT elements as -infinity: a record
    with a NULL order value never beats one with a real value — the same
    outcome as max_by in the batch view, where null ordering keys lose
    to any non-null. Equal tuples return True (later record wins)."""
    import pandas as pd

    for x, y in zip(a, b):
        xn = x is None or (not isinstance(x, (str, bytes, list, dict)) and pd.isna(x))
        yn = y is None or (not isinstance(y, (str, bytes, list, dict)) and pd.isna(y))
        if xn and yn:
            continue
        if xn:
            return False
        if yn:
            return True
        if x == y:
            continue
        return x > y
    return True


def _lexi_best(sub, ord_cols):
    """Positional label of the LAST row achieving the lexicographic max of
    ``ord_cols`` with NULL/NaT as -infinity — the vectorized equivalent of
    folding ``_ord_ge`` over the rows in arrival order (same total order,
    same later-record-wins tie break). Column-wise C-speed comparisons
    instead of a per-record Python loop."""
    import pandas as pd

    cur = sub
    for c in ord_cols:
        if len(cur) == 1:
            break
        col = cur[c]
        m = col.max()
        if m is None or (not isinstance(m, (str, bytes, list, dict)) and pd.isna(m)):
            continue  # whole element NULL: tie at -infinity, next element
        cur = cur[col == m]  # NULL rows compare False: they lose
    return cur.index[-1]


# below this many records per key-batch the plain dict loop beats pandas
# column-op fixed overhead; above it the vectorized reduction wins and the
# gap grows with velocity (measured in this container, 1 timestamp order
# column: n=32 loop 2.1x faster, n=128 ~par, n=512 vec 1.9x, n=2048 vec
# 5.4x, n=8192 vec 18x)
_SMALL_GROUP = 128


def _make_processor(how: str, key_names, lv_names, rv_names, out_rv_names,
                    lo_cols, ro_cols, small_group: int = _SMALL_GROUP):
    """Build the per-key stateful function. Everything it closes over is
    plain Python data (cloudpickle ships it by value to the workers).
    ``small_group`` is the loop/vectorized cutover (captured by value so
    tests can force either path)."""

    def process(key, pdfs, state):
        import base64
        import pickle

        import pandas as pd

        def enc(o):
            return base64.b64encode(pickle.dumps(o)).decode()

        def dec(s):
            return pickle.loads(base64.b64decode(s))

        if state.exists:
            lo_s, lv_s, ro_s, rv_s, emitted, seq = state.get
            lo = dec(lo_s) if lo_s is not None else None
            lv = dec(lv_s) if lv_s is not None else None
            ro = dec(ro_s) if ro_s is not None else None
            rv = dec(rv_s) if rv_s is not None else None
        else:
            lo = lv = ro = rv = None
            emitted, seq = False, 0

        chunks = [p for p in pdfs if len(p)]
        nrec = sum(len(p) for p in chunks)
        if nrec and nrec <= small_group:
            for pdf in chunks:
                for rec in pdf.to_dict("records"):
                    if rec["__side"] == 0:
                        o = tuple(rec[c] for c in lo_cols)
                        # >= : a same-order later record wins, like max_by;
                        # NULL order elements lose to real ones (_ord_ge)
                        if lo is None or _ord_ge(o, lo):
                            lo = o
                            lv = None if rec["__tomb"] else rec["__lv"]
                    else:
                        o = tuple(rec[c] for c in ro_cols)
                        if ro is None or _ord_ge(o, ro):
                            ro = o
                            rv = None if rec["__tomb"] else rec["__rv"]
        elif nrec:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            side = pdf["__side"].to_numpy()
            for mask, ord_cols, val_col, cur in (
                (side == 0, lo_cols, "__lv", "l"),
                (side == 1, ro_cols, "__rv", "r"),
            ):
                sub = pdf[mask]
                if not len(sub):
                    continue
                r = pdf.loc[_lexi_best(sub, ord_cols)]
                o = tuple(r[c] for c in ord_cols)
                if cur == "l":
                    if lo is None or _ord_ge(o, lo):
                        lo = o
                        lv = None if r["__tomb"] else r[val_col]
                else:
                    if ro is None or _ord_ge(o, ro):
                        ro = o
                        rv = None if r["__tomb"] else r[val_col]
        seq += nrec

        if how == "inner":
            active = lv is not None and rv is not None
        elif how == "left":
            active = lv is not None
        else:  # full_outer
            active = lv is not None or rv is not None

        out_rows = []
        if active:
            row = dict(zip(key_names, key))
            for n in lv_names:
                row[n] = lv.get(n) if lv is not None else None
            for orig, out in zip(rv_names, out_rv_names):
                row[out] = rv.get(orig) if rv is not None else None
            row["__seq"] = seq
            out_rows.append(row)
            emitted = True
        elif emitted:
            # the joined row existed and no longer does: retract (the
            # KTable tombstone — all value columns NULL, key + seq kept)
            row = dict(zip(key_names, key))
            for n in lv_names:
                row[n] = None
            for out in out_rv_names:
                row[out] = None
            row["__seq"] = seq
            out_rows.append(row)
            emitted = False

        state.update(
            (
                enc(lo) if lo is not None else None,
                enc(lv) if lv is not None else None,
                enc(ro) if ro is not None else None,
                enc(rv) if rv is not None else None,
                emitted,
                seq,
            )
        )
        if out_rows:
            yield pd.DataFrame(out_rows)

    return process


def _make_stream_table_processor(how: str, key_names, lv_names, rv_names, out_rv_names):
    """Per-key stateful fn for stream ⋈ live-table: state = latest right
    row; each LEFT record emits one enriched row. WITHIN a micro-batch,
    records are applied in event-time order (right before left at equal
    timestamps), so a table update at time T is visible to stream records
    with ts >= T of the same batch — Kafka Streams' timestamp-synchronized
    lookup, per micro-batch. Across batches the guarantee is weaker: a
    table update arriving in a LATER micro-batch than a stream record with
    a later event time does not retro-apply (the stream record was already
    emitted). Co-partition and align batch boundaries (e.g. one source,
    maxFilesPerTrigger) when strict cross-batch synchronization matters."""

    def process(key, pdfs, state):
        import base64
        import pickle

        import pandas as pd

        def enc(o):
            return base64.b64encode(pickle.dumps(o)).decode()

        def dec(s):
            return pickle.loads(base64.b64decode(s))

        if state.exists:
            ro_s, rv_s = state.get
            ro = dec(ro_s) if ro_s is not None else None
            rv = dec(rv_s) if rv_s is not None else None
        else:
            ro = rv = None

        recs = []
        for pdf in pdfs:
            recs.extend(pdf.to_dict("records"))
        recs.sort(key=lambda r: (r["__ts"], r["__side"]))

        out_rows = []
        for rec in recs:
            if rec["__side"] == 0:  # right (table) update
                o = tuple(rec["__rord"].values())
                if ro is None or _ord_ge(o, ro):
                    ro = o
                    rv = None if rec["__tomb"] else rec["__rv"]
                continue
            # left (stream) record: emit the lookup result
            if how == "inner" and rv is None:
                continue
            row = dict(zip(key_names, key))
            lv = rec["__lv"]
            for n in lv_names:
                row[n] = lv.get(n) if lv is not None else None
            for orig, out in zip(rv_names, out_rv_names):
                row[out] = rv.get(orig) if rv is not None else None
            out_rows.append(row)

        state.update(
            (enc(ro) if ro is not None else None, enc(rv) if rv is not None else None)
        )
        if out_rows:
            yield pd.DataFrame(out_rows)

    return process


def stream_table_join(left, right: KTableRel, how: str):
    """Streaming KStream ⋈ streaming KTable (both sides live): per-key
    latest-right state, one output row per stream record
    (eval_test.clj:446-450 with a live table side). ``how`` in
    {"inner", "left"}. State is O(keys) — only the table side is stored;
    stream records pass through their arrival batch.

    Timestamp synchronization is per micro-batch (see
    ``_make_stream_table_processor``): table updates that arrive in a
    later micro-batch than an already-emitted stream record do not
    retro-apply to it."""
    if right.changelog is None:
        raise TypeDispatchError(
            "streaming stream-table join needs the table's raw changelog: "
            "join a [:table ...] source directly (view transforms drop it)"
        )
    if left.time_col is None:
        raise TypeDispatchError(
            "streaming stream-table join needs a time column on the stream "
            "side (records synchronize with table updates by event time)"
        )
    rdf, rorder, rtomb = right.changelog
    lk, rk = list(left.key_cols), list(right.key_cols)
    if len(lk) != len(rk):
        raise TypeDispatchError(f"key arity mismatch: {lk} vs {rk}")
    ldf = left.df
    rtime = right.time_col or rorder[0]
    lvals = [c for c in ldf.columns if c not in lk]
    rvals = [c for c in rdf.columns if c not in rk]
    taken = set(lk) | set(lvals)
    out_rvals = [f"r_{c}" if c in taken else c for c in rvals]

    rord = F.struct(*[F.col(c).alias(f"o{i}") for i, c in enumerate(rorder)])
    lv_struct = F.struct(*[F.col(c) for c in lvals])
    rv_struct = F.struct(*[F.col(c) for c in rvals])
    rord_t = rdf.select(rord.alias("x")).schema["x"].dataType
    lv_t = ldf.select(lv_struct.alias("x")).schema["x"].dataType
    rv_t = rdf.select(rv_struct.alias("x")).schema["x"].dataType

    r_tagged = rdf.select(
        *[F.col(o).alias(n) for o, n in zip(rk, lk)],
        F.col(rtime).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__side"),  # right first at equal timestamps
        rord.alias("__rord"),
        (rtomb if rtomb is not None else F.lit(False)).alias("__tomb"),
        F.lit(None).cast(lv_t).alias("__lv"),
        rv_struct.alias("__rv"),
    )
    l_tagged = ldf.select(
        *[F.col(c) for c in lk],
        F.col(left.time_col).cast("timestamp").alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rord_t).alias("__rord"),
        F.lit(False).alias("__tomb"),
        lv_struct.alias("__lv"),
        F.lit(None).cast(rv_t).alias("__rv"),
    )
    u = l_tagged.unionByName(r_tagged)

    schema_parts = [f"`{c}` {ldf.schema[c].dataType.simpleString()}" for c in lk]
    schema_parts += [f"`{c}` {ldf.schema[c].dataType.simpleString()}" for c in lvals]
    schema_parts += [
        f"`{n}` {rdf.schema[o].dataType.simpleString()}" for o, n in zip(rvals, out_rvals)
    ]
    out = u.groupBy(*[F.col(c) for c in lk]).applyInPandasWithState(
        _make_stream_table_processor(how, lk, lvals, rvals, out_rvals),
        outputStructType=", ".join(schema_parts),
        stateStructType="ro string, rv string",
        outputMode="update",
        timeoutConf="NoTimeout",
    )
    return KStreamRel(out, key_cols=tuple(lk), time_col=None)


def changelog_join(left: KTableRel, right: KTableRel, how: str,
                   small_group: int = _SMALL_GROUP) -> KTableRel:
    """Join two STREAMING KTables by their raw changelogs (see module
    docstring). ``how`` in {"inner", "left", "full_outer"}.
    ``small_group``: per-key batch size below which the reduction uses the
    plain record loop instead of the vectorized path (test hook)."""
    if left.changelog is None or right.changelog is None:
        raise TypeDispatchError(
            "streaming table-table join needs both sides' raw changelogs: "
            "join [:table ...] sources directly (view transforms drop the "
            "changelog — apply filters/map-values AFTER the join, or to the "
            "underlying stream before table-ifying)"
        )
    ldf, lorder, ltomb = left.changelog
    rdf, rorder, rtomb = right.changelog
    lk, rk = list(left.key_cols), list(right.key_cols)
    if len(lk) != len(rk):
        raise TypeDispatchError(f"key arity mismatch: {lk} vs {rk}")
    lvals = [c for c in ldf.columns if c not in lk]
    rvals = [c for c in rdf.columns if c not in rk]
    taken = set(lk) | set(lvals)
    out_rvals = [f"r_{c}" if c in taken else c for c in rvals]

    # order elements as flat typed columns (NOT a struct): structs arrive
    # in pandas as per-row dicts, forcing a Python record loop; flat
    # columns keep the per-key batch reduction vectorized (_lexi_best)
    lo_cols = [f"__lo{i}" for i in range(len(lorder))]
    ro_cols = [f"__ro{i}" for i in range(len(rorder))]
    lo_types = [ldf.schema[c].dataType for c in lorder]
    ro_types = [rdf.schema[c].dataType for c in rorder]
    lv_struct = F.struct(*[F.col(c) for c in lvals])
    rv_struct = F.struct(*[F.col(c) for c in rvals])
    lv_t = ldf.select(lv_struct.alias("x")).schema["x"].dataType
    rv_t = rdf.select(rv_struct.alias("x")).schema["x"].dataType

    l_tagged = ldf.select(
        *[F.col(c) for c in lk],
        *[F.col(c).alias(n) for c, n in zip(lorder, lo_cols)],
        *[F.lit(None).cast(t).alias(n) for t, n in zip(ro_types, ro_cols)],
        F.lit(0).alias("__side"),
        (ltomb if ltomb is not None else F.lit(False)).alias("__tomb"),
        lv_struct.alias("__lv"),
        F.lit(None).cast(rv_t).alias("__rv"),
    )
    r_tagged = rdf.select(
        *[F.col(o).alias(n) for o, n in zip(rk, lk)],
        *[F.lit(None).cast(t).alias(n) for t, n in zip(lo_types, lo_cols)],
        *[F.col(c).alias(n) for c, n in zip(rorder, ro_cols)],
        F.lit(1).alias("__side"),
        (rtomb if rtomb is not None else F.lit(False)).alias("__tomb"),
        F.lit(None).cast(lv_t).alias("__lv"),
        rv_struct.alias("__rv"),
    )
    u = l_tagged.unionByName(r_tagged)

    schema_parts = [f"`{c}` {ldf.schema[c].dataType.simpleString()}" for c in lk]
    schema_parts += [f"`{c}` {ldf.schema[c].dataType.simpleString()}" for c in lvals]
    schema_parts += [
        f"`{n}` {rdf.schema[o].dataType.simpleString()}" for o, n in zip(rvals, out_rvals)
    ]
    schema_parts += ["`__seq` bigint"]

    out = u.groupBy(*[F.col(c) for c in lk]).applyInPandasWithState(
        _make_processor(how, lk, lvals, rvals, out_rvals, lo_cols, ro_cols,
                        small_group=small_group),
        # (update_only: this plan is applyInPandasWithState — update
        # output mode only; __seq orders emissions per key)
        outputStructType=", ".join(schema_parts),
        stateStructType="lo string, lv string, ro string, rv string, emitted boolean, seq bigint",
        outputMode="update",
        timeoutConf="NoTimeout",
    )
    return KTableRel(out, key_cols=tuple(lk), time_col=None, update_only=True)
