"""Stateless operator tests (SURVEY.md §2.2) — data-correctness per
operator, the upgrade over the reference's constructive-only suite
(eval_test.clj:370-407)."""

import pytest
from pyspark.sql import functions as F

from ksml_spark import BranchedRel, KStreamRel, ksml, pipe


def events_stream(tables):
    return ["stream", tables["events"], {"key": "user_id", "time": "ts"}]


def test_filter_sql_and_symbolic(spark, tables):
    n_all = tables["events"].count()
    # SQL-string predicate
    s1 = pipe(events_stream(tables), ["filter", ["predicate", "value > 0.5"]], spark=spark)
    # symbolic Column predicate (k, v are Columns)
    s2 = pipe(
        events_stream(tables),
        ["filter", ["predicate", lambda k, v: v["value"] > 0.5]],
        spark=spark,
    )
    expected = tables["events"].filter("value > 0.5").count()
    assert s1.df.count() == expected == s2.df.count()
    assert 0 < expected < n_all


def test_filter_not_is_complement(spark, tables):
    s = events_stream(tables)
    kept = pipe(s, ["filter", ["predicate", "value > 0.5"]], spark=spark).df.count()
    dropped = pipe(s, ["filter-not", ["predicate", "value > 0.5"]], spark=spark).df.count()
    nulls = tables["events"].filter(F.col("value").isNull()).count()
    assert kept + dropped + nulls == tables["events"].count()


def test_filter_opaque_python_predicate(spark, tables):
    s = pipe(
        events_stream(tables),
        ["filter", ["predicate", lambda k, v: v > 0.5, "py"]],
        spark=spark,
    )
    # opaque predicate receives the value (single struct); here value is a
    # struct so compare via field is not possible per-row — use a stream
    # with a single value column instead
    small = ksml(["stream", tables["events"].select("user_id", "value"), {"key": "user_id"}], spark=spark)
    out = ksml(["filter", small, ["predicate", lambda k, v: v is not None and v > 0.5, "py"]], spark=spark)
    assert out.df.count() == tables["events"].filter("value > 0.5").count()


def test_map_rekey(spark, tables):
    out = pipe(
        events_stream(tables),
        ["map", ["key-value-mapper", lambda k, v: ({"etype": v["event_type"]}, {"value": v["value"]})]],
        spark=spark,
    )
    assert out.key_cols == ("etype",)
    assert set(out.df.columns) == {"etype", "value", "ts"}
    assert out.df.count() == tables["events"].count()


def test_map_values_preserves_key(spark, tables):
    out = pipe(
        events_stream(tables),
        ["map-values", ["value-mapper", {"doubled": "value * 2"}]],
        spark=spark,
    )
    assert out.key_cols == ("user_id",)
    got = out.df.agg(F.sum("doubled")).first()[0]
    want = tables["events"].agg(F.sum(F.col("value") * 2)).first()[0]
    assert abs(got - want) < 1e-9


def test_select_key(spark, tables):
    out = pipe(
        events_stream(tables),
        ["select-key", ["key-value-mapper", {"etype": "event_type"}]],
        spark=spark,
    )
    assert out.key_cols == ("etype",)
    assert "user_id" not in out.df.columns  # the old key is replaced (KS select-key)
    assert out.df.count() == tables["events"].count()


def test_flat_map_values_explodes(spark, tables):
    out = pipe(
        ["stream", tables["documents"], {"key": "doc_id"}],
        ["flat-map-values", ["value-mapper", "split(lower(text), '[^a-z0-9]+')"], {"as": "w"}],
        ["where", "w <> ''"],
        spark=spark,
    )
    assert out.df.count() > tables["documents"].count()
    assert out.key_cols == ("doc_id",)


def test_flat_map_kv_pairs(spark, tables):
    # one record -> 2 records via array of (key, value) structs
    out = pipe(
        ["stream", tables["events"].select("user_id", "value"), {"key": "user_id"}],
        [
            "flat-map",
            [
                "key-value-mapper",
                lambda k, v: F.array(
                    F.struct(k.alias("key"), v.alias("value")),
                    F.struct((k + 1000000).alias("key"), (v * 2).alias("value")),
                ),
            ],
        ],
        spark=spark,
    )
    assert out.df.count() == 2 * tables["events"].count()
    assert out.key_cols == ("key",)


def test_branch_first_match_wins_and_partitions(spark, tables):
    branches = pipe(
        events_stream(tables),
        ["branch",
         ["predicate", "value > 0.8"],
         ["predicate", "value > 0.3"],
         ["predicate", "value is not null"]],
        spark=spark,
    )
    assert isinstance(branches, BranchedRel) and len(branches) == 3
    counts = [b.df.count() for b in branches.branches]
    total_matched = tables["events"].filter("value is not null").count()
    assert sum(counts) == total_matched  # disjoint + exhaustive over matches
    b1_direct = tables["events"].filter("value > 0.8").count()
    assert counts[0] == b1_direct
    b2_direct = tables["events"].filter("value <= 0.8 and value > 0.3").count()
    assert counts[1] == b2_direct


def test_merge_union(spark, tables):
    s = events_stream(tables)
    b = pipe(s, ["branch", ["predicate", "value > 0.5"], ["predicate", "value <= 0.5"]], spark=spark)
    merged = ksml(["merge", b[0], b[1]], spark=spark)
    assert merged.df.count() == tables["events"].filter("value is not null").count()


def test_to_stream_identity_on_batch(spark, kv_updates):
    t = ksml(["table", kv_updates, {"key": "key", "time": "event_time"}], spark=spark)
    s = ksml(["to-stream", t], spark=spark)
    assert isinstance(s, KStreamRel)
    assert s.df.count() == t.df.count()


def test_peek_observe_passthrough(spark, tables):
    out = pipe(
        events_stream(tables),
        ["peek", ["foreach-action", "count(1)"]],
        spark=spark,
    )
    assert out.df.count() == tables["events"].count()


def test_repartitioned(spark, tables):
    out = pipe(events_stream(tables), ["repartitioned", 4], spark=spark)
    assert out.df.rdd.getNumPartitions() == 4
    assert out.df.count() == tables["events"].count()


def test_named_metadata(spark, tables):
    out = pipe(
        events_stream(tables),
        ["filter", ["predicate", "value > 0"], ["named", "positive-values"]],
        spark=spark,
    )
    assert out.name == "positive-values"


def test_filter_not_is_filter_complement(spark, tables):
    """Retirement pin (r16, clause c — the anti-join precedent):
    filter-not is a one-line ``~`` dispatch into the same
    predicate_condition + df.filter construction as the still-oracled
    filter_highqty row. Its op-specific surface is exactly the
    complement: on the driver tables, filter and filter-not with the
    same predicate partition the stream EXACTLY — disjoint by the
    predicate value, union = every row (row MULTISETS, since the
    synthetic lineitem's (orderkey, linenumber) pairs are not unique)."""
    src = ["stream", tables["lineitem"],
           {"key": ["l_orderkey", "l_linenumber"]}]
    pred = ["predicate", "l_returnflag = 'R'"]
    keep = ksml(["filter", src, pred], spark=spark).df
    drop = ksml(["filter-not", src, pred], spark=spark).df
    cols = tables["lineitem"].columns
    k = sorted(map(tuple, keep.select(*cols).collect()))
    d = sorted(map(tuple, drop.select(*cols).collect()))
    allrows = sorted(map(tuple, tables["lineitem"].select(*cols).collect()))
    # disjoint by predicate value, and the union is the exact multiset
    assert all(t[cols.index("l_returnflag")] == "R" for t in k)
    assert all(t[cols.index("l_returnflag")] != "R" for t in d)
    assert sorted(k + d) == allrows
    # and the kept side agrees with the predicate applied directly
    assert k == sorted(map(tuple, tables["lineitem"]
                           .filter("l_returnflag = 'R'")
                           .select(*cols).collect()))
