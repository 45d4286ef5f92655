"""Grouping/aggregation/window tests (SURVEY.md §2.4-2.5)."""

import pytest
from pyspark.sql import functions as F

from ksml_spark import KTableRel, ksml, pipe


def events_stream(tables):
    return ["stream", tables["events"], {"key": "user_id", "time": "ts"}]


def test_group_by_key_count(spark, tables):
    out = pipe(events_stream(tables), ["group-by-key"], ["count"], spark=spark)
    assert isinstance(out, KTableRel)
    got = {r["user_id"]: r["count"] for r in out.df.collect()}
    want = {
        r["user_id"]: r["count"]
        for r in tables["events"].groupBy("user_id").count().collect()
    }
    assert got == want


def test_group_by_rekey_count(spark, tables):
    out = pipe(
        events_stream(tables),
        ["group-by", ["key-value-mapper", {"etype": "event_type"}]],
        ["count"],
        spark=spark,
    )
    got = {r["etype"]: r["count"] for r in out.df.collect()}
    want = {r["event_type"]: r["count"] for r in tables["events"].groupBy("event_type").count().collect()}
    assert got == want


def test_reduce_sql_expr(spark, tables):
    out = pipe(
        events_stream(tables),
        ["group-by-key"],
        ["reduce", ["reducer", {"total": "sum(value)"}]],
        spark=spark,
    )
    got = {r["user_id"]: round(r["total"], 6) for r in out.df.collect()}
    want = {
        r["user_id"]: round(r["s"], 6)
        for r in tables["events"].groupBy("user_id").agg(F.sum("value").alias("s")).collect()
    }
    assert got == want


def test_reduce_opaque_fold_matches_builtin(spark, tables):
    small = tables["events"].select("user_id", "ts", "value").limit(200)
    out = pipe(
        ["stream", small, {"key": "user_id", "time": "ts"}],
        ["group-by-key"],
        ["reduce", ["reducer", lambda acc, v: (acc or 0.0) + (v or 0.0)]],
        spark=spark,
    )
    got = {r["user_id"]: round(r["value"], 6) for r in out.df.collect()}
    want = {
        r["user_id"]: round(r["s"], 6)
        for r in small.groupBy("user_id").agg(F.sum("value").alias("s")).collect()
    }
    assert got == want


def test_aggregate_expression_form(spark, tables):
    out = pipe(
        events_stream(tables),
        ["group-by", ["key-value-mapper", {"etype": "event_type"}]],
        ["aggregate",
         ["initializer", 0],
         ["aggregator", {"n": "count(1)", "avg_value": "avg(value)"}]],
        spark=spark,
    )
    rows = {r["etype"]: (r["n"], round(r["avg_value"], 6)) for r in out.df.collect()}
    want = {
        r["event_type"]: (r["n"], round(r["a"], 6))
        for r in tables["events"]
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.avg("value").alias("a"))
        .collect()
    }
    assert rows == want


def test_aggregate_opaque_fold(spark, tables):
    small = tables["events"].select("user_id", "ts", "value").limit(100)
    out = pipe(
        ["stream", small, {"key": "user_id", "time": "ts"}],
        ["group-by-key"],
        ["aggregate",
         ["initializer", lambda: 0.0],
         ["aggregator", lambda k, v, acc: acc + 1.0]],
        spark=spark,
    )
    got = {r["user_id"]: r["value"] for r in out.df.collect()}
    want = {r["user_id"]: float(r["count"]) for r in small.groupBy("user_id").count().collect()}
    assert got == want


def test_windowed_count_tumbling(spark, tables):
    out = pipe(
        events_stream(tables),
        ["group-by-key"],
        ["count", ["time-window", 60_000]],
        spark=spark,
    )
    assert {"window_start", "window_end", "user_id", "count"} <= set(out.df.columns)
    # total across windows == total rows with non-null ts
    total = out.df.agg(F.sum("count")).first()[0]
    assert total == tables["events"].filter(F.col("ts").isNotNull()).count()
    # spot-check one bucket against a direct computation
    direct = (
        tables["events"]
        .groupBy(F.window("ts", "60 seconds").alias("w"), "user_id")
        .count()
        .select(F.col("w.start").alias("window_start"), "user_id", "count")
    )
    got = {(r["window_start"], r["user_id"]): r["count"] for r in out.df.collect()}
    want = {(r["window_start"], r["user_id"]): r["count"] for r in direct.collect()}
    assert got == want


def test_windowed_count_hopping(spark, tables):
    out = pipe(
        events_stream(tables),
        ["group-by-key"],
        ["count", ["time-window", 300_000, 60_000]],
        spark=spark,
    )
    # every event lands in size/slide = 5 windows
    total = out.df.agg(F.sum("count")).first()[0]
    assert total == 5 * tables["events"].filter(F.col("ts").isNotNull()).count()


def test_windowed_count_session(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("u1", base),
        ("u1", base + dt.timedelta(seconds=10)),   # same session (gap 30s)
        ("u1", base + dt.timedelta(seconds=100)),  # new session
        ("u2", base),
    ]
    df = SparkDF = None
    spark_df = spark.createDataFrame(rows, "key string, event_time timestamp")
    out = pipe(
        ["stream", spark_df, {"key": "key", "time": "event_time"}],
        ["group-by-key"],
        ["count", ["session-window", 30_000]],
        spark=spark,
    )
    rows_out = {(r["key"], r["count"]) for r in out.df.collect()}
    assert rows_out == {("u1", 2), ("u1", 1), ("u2", 1)}


def test_duration_parsing(spark):
    assert ksml(["duration", "PT1H"], spark=spark) == "3600 seconds"
    assert ksml(["duration", "PT24H"], spark=spark) == "86400 seconds"
    assert ksml(["duration", "P1DT30S"], spark=spark) == "86430 seconds"


def test_windowed_by_form(spark, tables):
    out = pipe(
        events_stream(tables),
        ["group-by-key"],
        ["windowed-by", ["time-window", 60_000]],
        ["count"],
        spark=spark,
    )
    assert "window_start" in out.df.columns


def test_rollup_includes_subtotals(spark, tables):
    from ksml_spark import pipe

    out = pipe(
        ["stream", tables["lineitem"], {"key": ["l_orderkey", "l_linenumber"]}],
        ["rollup", ["l_returnflag", "l_linestatus"], {"n": "count(1)"}],
        spark=spark,
    ).df
    rows = {(r["l_returnflag"], r["l_linestatus"]): r["n"] for r in out.collect()}
    total = tables["lineitem"].count()
    assert rows[(None, None)] == total
    # per-flag subtotal equals the sum of its (flag, status) cells
    flags = {k[0] for k in rows if k[0] is not None and k[1] is not None}
    for f in flags:
        assert rows[(f, None)] == sum(v for (a, b), v in rows.items()
                                      if a == f and b is not None)


def test_approx_distinct_near_exact(spark, tables):
    from ksml_spark import pipe

    approx = pipe(
        ["stream", tables["events"], {"key": "event_type"}],
        ["approx-distinct", "user_id", {"by": ["event_type"], "rsd": 0.02}],
        spark=spark,
    ).df
    exact = (tables["events"].groupBy("event_type")
             .agg({"user_id": "count"}))  # upper bound sanity only
    got = {r["event_type"]: r["approx_distinct"] for r in approx.collect()}
    from pyspark.sql import functions as F
    ex = {r["event_type"]: r["n"] for r in
          tables["events"].groupBy("event_type")
          .agg(F.countDistinct("user_id").alias("n")).collect()}
    for k, v in ex.items():
        assert abs(got[k] - v) <= max(2, 0.1 * v)


def test_agg_salted_matches_plain(spark, tables):
    from ksml_spark import pipe

    salted = pipe(
        ["stream", tables["events"], {"key": "user_id", "time": "ts"}],
        ["group-by-key"],
        ["agg-salted", {"n": "count(1)", "mx": "max(value)"}, {"salt": 8}],
        spark=spark,
    ).df
    plain = pipe(
        ["stream", tables["events"], {"key": "user_id", "time": "ts"}],
        ["group-by-key"],
        ["agg", {"n": "count(1)", "mx": "max(value)"}],
        spark=spark,
    ).df
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}


def test_reduce_opaque_fold_string_value_type(spark):
    """Non-numeric accumulator with {'value-type': 'string'} passes through
    uncoerced (ADVICE r01: float(acc) crashed string reducers)."""
    from ksml_spark import ksml

    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "z", 1)],
        "key string, tok string, seq long",
    )
    s = ksml(["stream", df.withColumn("event_time", F.timestamp_seconds(F.col("seq"))).drop("seq"),
              {"key": "key", "time": "event_time"}], spark=spark)
    out = ksml(
        ["reduce", ["group-by-key", s],
         ["reducer", lambda acc, v: acc + "," + v],
         {"value-type": "string"}],
        spark=spark,
    )
    rows = {r["key"]: r["value"] for r in out.df.collect()}
    assert rows == {"a": "x,y", "b": "z"}


def test_process_batch_empty_yield_for_some_keys(spark):
    """A processor that emits nothing for a key must not crash
    applyInPandas schema validation (ADVICE r01)."""
    import pandas as pd

    from ksml_spark import ksml

    df = spark.createDataFrame([("a", 5), ("b", 1)], "key string, v long")

    def proc(key, batches, state):
        for pdf in batches:
            if pdf["v"].sum() > 3:
                yield pd.DataFrame({"key": [key[0]], "total": [int(pdf["v"].sum())]})
            # else: emit nothing for this key

    s = ksml(["stream", df, {"key": "key"}], spark=spark)
    out = ksml(["process", s, proc, {"schema": "key string, total long"}], spark=spark)
    rows = {r["key"]: r["total"] for r in out.df.collect()}
    assert rows == {"a": 5}


def test_session_aggregate_custom_merger_golden(spark):
    """Opaque session :aggregate with a custom :merger (eval.clj:275-278).
    Arrival order makes record 'c' bridge two open sessions, firing
    merger(k, agg1, agg2). Golden result hand-computed."""
    import datetime as dt

    def ts(sec):
        return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=sec)

    from ksml_spark import ksml

    rows = [
        # key u: arrival order a(t=0), b(t=15), c(t=8) — c bridges a and b
        ("u", "a", ts(0), 1),
        ("u", "b", ts(15), 2),
        ("u", "c", ts(8), 3),
        # key w: plain in-order session, merger never fires
        ("w", "x", ts(0), 1),
        ("w", "y", ts(5), 2),
        # key u again, far away: separate session
        ("u", "d", ts(100), 4),
    ]
    df = spark.createDataFrame(rows, "key string, val string, event_time timestamp, seq long")
    s = ksml(["stream", df, {"key": "key", "time": "event_time"}], spark=spark)
    out = ksml(
        ["aggregate",
         ["windowed-by", ["group-by-key", s], ["session-window", 10000]],
         ["initializer", lambda: ""],
         ["aggregator", lambda k, v, acc: v if acc == "" else acc + "+" + v],
         ["merger", lambda k, a1, a2: a1 + "|" + a2],
         {"value-type": "string", "arrival": "seq"}],
        spark=spark,
    )
    got = {(r["key"], r["window_start"].second, r["window_end"].second): r["value"]
           for r in out.df.collect()}
    assert got == {
        ("u", 0, 15): "a|b+c",   # merger fired: sessions [0,0]"a" + [15,15]"b", then c
        ("w", 0, 5): "x+y",
        ("u", 40, 40): "d",      # second=40 because 100s = 1min40s
    }


def test_session_aggregate_without_merger_raises_on_bridge(spark):
    import datetime as dt

    from ksml_spark import ksml
    from ksml_spark.errors import TypeDispatchError

    def ts(sec):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

    df = spark.createDataFrame(
        [("u", "a", ts(0), 1), ("u", "b", ts(15), 2), ("u", "c", ts(8), 3)],
        "key string, val string, event_time timestamp, seq long",
    )
    s = ksml(["stream", df, {"key": "key", "time": "event_time"}], spark=spark)
    out = ksml(
        ["aggregate",
         ["windowed-by", ["group-by-key", s], ["session-window", 10000]],
         ["initializer", lambda: ""],
         ["aggregator", lambda k, v, acc: v if acc == "" else acc + "+" + v],
         {"value-type": "string", "arrival": "seq"}],
        spark=spark,
    )
    with pytest.raises(Exception, match="merger"):
        out.df.collect()


def test_sessionize_labels_match_session_window_aggregation(spark, tables):
    """Per-event session labels must reconstruct exactly the sessions
    the session-window AGGREGATION reports (same gap): one label per
    (key, window_start), event counts equal the windowed counts, and
    session_start equals the window's start."""
    from ksml_spark import pipe
    from ksml_spark.errors import ArityError, TypeDispatchError

    gap = 3600000
    labeled = pipe(
        ["stream", tables["events"], {"key": "user_id", "time": "ts"}],
        ["sessionize", {"gap": gap}],
        spark=spark,
    ).df
    agg = pipe(
        ["stream", tables["events"], {"key": "user_id", "time": "ts"}],
        ["group-by-key"],
        ["windowed-by", ["session-window", gap]],
        ["count"],
        spark=spark,
    ).df
    got = {}
    for r in labeled.collect():
        got.setdefault((r["user_id"], r["session_start"]), []).append(r)
    # Kafka-Streams-style session bounds in this engine report
    # [earliest, latest] via _finish on F.session_window (start = first
    # event); counts per (key, start) must match exactly
    exp = {(r["user_id"], r["window_start"]): r["count"] for r in agg.collect()}
    assert {k: len(v) for k, v in got.items()} == exp
    # session ids are 0-based consecutive per key in time order
    per_key = {}
    for (uid, start), rows in sorted(got.items(), key=lambda kv: (kv[0][0], kv[0][1])):
        sids = {r["session_id"] for r in rows}
        assert len(sids) == 1
        per_key.setdefault(uid, []).append(sids.pop())
    for uid, sids in per_key.items():
        assert sids == list(range(len(sids)))

    import pytest as _pytest
    with _pytest.raises(ArityError, match="gap"):
        pipe(["stream", tables["events"], {"key": "user_id", "time": "ts"}],
             ["sessionize", {}], spark=spark)


def test_duration_subsecond_and_zero_refusals(spark):
    """The r15-verdict falsy-zero finish, amended per ADVICE r16:
    sub-second durations emit milliseconds instead of truncating to a
    silent zero interval; ZERO durations are now legal (PT0S is Kafka's
    ofSizeAndGrace(size, ZERO) and a meaningful 0-delay watermark —
    omitting grace is NOT equivalent in streaming); sub-millisecond
    durations refuse curatedly; and window SIZES refuse zero/negative/
    fractional at the consumption site — including a zero duration
    STRING fed in as a size."""
    from ksml_spark.errors import ArityError

    assert ksml(["duration", "PT0.5S"], spark=spark) == "500 milliseconds"
    assert ksml(["duration", "PT1.25S"], spark=spark) == "1250 milliseconds"
    assert ksml(["duration", "PT2.0S"], spark=spark) == "2 seconds"
    assert ksml(["duration", "PT0S"], spark=spark) == "0 seconds"
    assert ksml(["duration", "P0D"], spark=spark) == "0 seconds"
    with pytest.raises(ArityError, match="sub-millisecond"):
        ksml(["duration", "PT0.0005S"], spark=spark)
    # ADVICE r17: decimal-zero and multi-component-zero interval strings
    # must refuse too (the old guard pattern-matched one literal-zero
    # form), while mixed strings with any nonzero component stay legal
    for bad in (0, -1000, 0.5, "0 seconds", "0 milliseconds",
                "0.0 seconds", "0 days 0 hours", "0.00 minutes"):
        with pytest.raises(ArityError, match="window size must be"):
            ksml(["time-window", bad], spark=spark)
    with pytest.raises(ArityError, match="window size must be"):
        ksml(["time-window", 60_000, 0], spark=spark)  # zero advance
    with pytest.raises(ArityError, match="window size must be"):
        ksml(["session-window", -5], spark=spark)
    with pytest.raises(ArityError, match="window size must be"):
        ksml(["join-window", 0], spark=spark)
    # a zero-duration string produced by op_duration refuses as a SIZE
    with pytest.raises(ArityError, match="window size must be"):
        ksml(["time-window", ksml(["duration", "PT0S"], spark=spark)],
             spark=spark)


def test_hopping_count_is_rolling_sum_of_tumbling(spark, tables):
    """Retirement pin (r16, clause c — the anti-join precedent): a
    hopping window is the SAME WindowSpec -> F.window construction as
    the still-oracled tumbling windowed_count row, plus one argument
    (slideDuration). Its op-specific surface is exactly the overlap
    arithmetic: with size = 2 x advance, the hopping count for a window
    starting at ws equals tumbling(advance) at ws plus tumbling(advance)
    at ws + advance — pinned here on the driver events table."""
    size_ms, adv_ms = 7_200_000, 3_600_000
    hop = pipe(
        ["stream", tables["events"], {"key": "event_type", "time": "ts"}],
        ["group-by-key"],
        ["windowed-by", ["time-window", size_ms, adv_ms]],
        ["count"],
        ["select", {"ws": "cast(unix_timestamp(window_start) as bigint)",
                    "event_type": "event_type", "n": "`count`"}],
        spark=spark).df
    tum = pipe(
        ["stream", tables["events"], {"key": "event_type", "time": "ts"}],
        ["group-by-key"],
        ["windowed-by", ["time-window", adv_ms]],
        ["count"],
        ["select", {"ws": "cast(unix_timestamp(window_start) as bigint)",
                    "event_type": "event_type", "n": "`count`"}],
        spark=spark).df
    t = {(r["ws"], r["event_type"]): r["n"] for r in tum.collect()}
    adv_s = adv_ms // 1000
    expected = {}
    for (ws, et), n in t.items():
        # a tumbling bucket at ws lands in hopping windows starting at
        # ws and ws - advance (size = 2 x advance)
        for hws in (ws, ws - adv_s):
            expected[(hws, et)] = expected.get((hws, et), 0) + n
    got = {(r["ws"], r["event_type"]): r["n"] for r in hop.collect()}
    assert got == expected and got
