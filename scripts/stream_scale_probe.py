"""Streaming scale probe (r11): state growth + throughput for the
stateful streaming paths — the sibling of scripts/scale_probe.py, which
covers batch plans only.

The batch probe measures wall-time exponents across data SF; streaming
cost has two extra axes the single-availableNow-batch bench rows never
exercise:

* KEYS: state stores grow with the live key space (changelog join holds
  both sides' latest-per-key, the session fold holds open sessions).
  Probe: 10x the key count at fixed row count -> state-row and
  wall-time exponents.
* BATCHES: the same input split into 10x as many micro-batches
  (maxFilesPerTrigger=1, one time-sliced file per batch) -> per-batch
  overhead, and — the one genuinely unbounded-state path — lsh-join's
  cross-batch candidate-pair dedup, measured WITH and WITHOUT
  {"dedup_within": ...} (dropDuplicatesWithinWatermark vs plain
  dropDuplicates).

State rows are read from StreamingQueryProgress.stateOperators
(numRowsTotal summed per progress, max over the run), the engine's own
state-store accounting — not an estimate.

Exponent convention matches scale_probe.py: exp = log10(big/small) for
a 10x input change; 1.0 = linear, ~0 = flat/bounded, >1 = superlinear
(investigate).

Usage: python scripts/stream_scale_probe.py
Results are transcribed into docs/SCALE.md (streaming probe section).
"""
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ksml_spark import get_spark, ksml  # noqa: E402
from ksml_spark.streaming.changelog_join import changelog_join  # noqa: E402

BASE_KEYS = 2_000
BASE_ROWS = 200_000
BASE_FILES = 4
T0 = "2026-01-01 00:00:00"


def gen_events(spark, path, keys, rows, files):
    """(user_id, value, ts) spread evenly over `files` one-hour slices,
    written oldest-first so the file source's mod-time order replays
    event time monotonically (watermarks advance batch to batch)."""
    df = spark.range(rows).select(
        F.col("id"),
        (F.col("id") % keys).alias("user_id"),
        (F.col("id") % 97).cast("double").alias("value"),
        F.expr(
            f"timestamp'{T0}' + make_interval(0, 0, 0, 0, "
            f"cast(id * {files} / {rows} as int), 0, "
            f"cast(id % 3600 as int))"
        ).alias("ts"),
    )
    for i in range(files):
        lo, hi = i * rows // files, (i + 1) * rows // files
        df.filter((F.col("id") >= lo) & (F.col("id") < hi)).drop("id") \
            .coalesce(1).write.mode("append").parquet(path)


def gen_docs(spark, path, docs, files, templates=200, static=False):
    """(doc_id, text, ts): texts drawn from a small template pool so a
    realistic fraction of stream docs near-duplicate the reference."""
    words = [f"w{i}" for i in range(40)]
    df = spark.range(docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.concat(F.lit(words[j]),
                       (((F.col("id") % templates) * 7 + j) % 37)
                       .cast("string"))
              for j in range(24)],
        ).alias("text"),
        F.expr(
            f"timestamp'{T0}' + make_interval(0, 0, 0, 0, "
            f"cast(id * {files} / {docs} as int), 0, 0)"
        ).alias("ts"),
    )
    if static:
        df.write.mode("overwrite").parquet(path)
        return
    for i in range(files):
        lo, hi = i * docs // files, (i + 1) * docs // files
        df.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)) \
            .coalesce(1).write.mode("append").parquet(path)


def stream_src(spark, path):
    key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        schema = spark.read.parquet(path).schema
    finally:
        spark.conf.set(key, prev)
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(path))


def run(df, ckpt, rows):
    t0 = time.time()
    q = (df.writeStream.format("noop").outputMode("update")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(900)
    secs = time.time() - t0
    batches, max_state, last_state = 0, 0, 0
    for p in q.recentProgress:
        if not isinstance(p, dict):
            p = json.loads(p.json)
        if p.get("numInputRows", 0) or p.get("stateOperators"):
            batches += 1
        tot = sum(so.get("numRowsTotal", 0)
                  for so in (p.get("stateOperators") or []))
        max_state = max(max_state, tot)
        if tot:
            last_state = tot
    return {"sec": round(secs, 2), "rows_s": round(rows / secs),
            "batches": batches, "max_state": max_state,
            "last_state": last_state}


def main():
    spark = get_spark(app_name="stream-scale-probe")
    tmp = tempfile.mkdtemp(prefix="ksml_stream_probe_")
    res = {}
    try:
        layouts = {
            "base": (BASE_KEYS, BASE_ROWS, BASE_FILES),
            "keys10": (BASE_KEYS * 10, BASE_ROWS, BASE_FILES),
            "batch10": (BASE_KEYS, BASE_ROWS, BASE_FILES * 10),
        }
        paths = {}
        for name, (k, r, f) in layouts.items():
            lp = os.path.join(tmp, f"ev_l_{name}")
            rp = os.path.join(tmp, f"ev_r_{name}")
            gen_events(spark, lp, k, r, f)
            gen_events(spark, rp, k, r, f)
            paths[name] = (lp, rp, r)

        def cl_join(name):
            lp, rp, r = paths[name]
            lt = ksml(["table", stream_src(spark, lp),
                       {"key": "user_id", "time": "ts", "order": ["ts"]}],
                      spark=spark)
            rt = ksml(["table", stream_src(spark, rp),
                       {"key": "user_id", "time": "ts", "order": ["ts"]}],
                      spark=spark)
            out = changelog_join(lt, rt, "inner")
            return run(out.df, os.path.join(tmp, f"ck_cl_{name}"), 2 * r)

        def sess_fold(name):
            lp, _, r = paths[name]
            s = ksml(["stream", stream_src(spark, lp),
                      {"key": "user_id", "time": "ts"}], spark=spark)
            s = ksml(["with-watermark", s, "1 hour"], spark=spark)
            out = ksml(
                ["aggregate",
                 ["windowed-by", ["group-by-key", s],
                  ["session-window", 3600000]],
                 ["initializer", lambda: 0.0],
                 ["aggregator", lambda k, v, acc: acc + (v or 0.0)],
                 ["merger", lambda k, a, b: a + b],
                 {"value-type": "double"}],
                spark=spark)
            return run(out.df, os.path.join(tmp, f"ck_sf_{name}"), r)

        for name in layouts:
            res[f"changelog_join/{name}"] = cl_join(name)
            res[f"session_fold/{name}"] = sess_fold(name)

        # lsh-join km: cross-batch candidate-pair dedup state
        ref_path = os.path.join(tmp, "docs_ref")
        gen_docs(spark, ref_path, 1_000, 1, static=True)
        ref = spark.read.parquet(ref_path).select("doc_id", "text")
        n_docs = 4_000
        for files in (BASE_FILES, BASE_FILES * 10):
            dp = os.path.join(tmp, f"docs_{files}")
            gen_docs(spark, dp, n_docs, files)
            for label, extra in (("nodedupwin", {"unbounded_ok": True}),
                                 ("dedupwin", {"dedup_within": "30 minutes"})):
                src = stream_src(spark, dp)
                out = ksml(
                    ["lsh-join",
                     ["stream", src, {"key": "doc_id", "time": "ts"}],
                     ["stream", ref, {"key": "doc_id"}],
                     dict({"broadcast": True}, **extra)],
                    spark=spark)
                res[f"lsh_join_km/{label}/b{files}"] = run(
                    out.df, os.path.join(tmp, f"ck_lsh_{label}_{files}"),
                    n_docs)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    hdr = f"{'probe':34s} {'sec':>7s} {'rows/s':>8s} {'batches':>7s} {'max_state':>10s} {'last':>10s}"
    print(hdr)
    for k, v in res.items():
        print(f"{k:34s} {v['sec']:>7.2f} {v['rows_s']:>8d} "
              f"{v['batches']:>7d} {v['max_state']:>10d} {v['last_state']:>10d}")

    def exp(a, b, field):
        va, vb = res[a][field], res[b][field]
        if not va or not vb:
            return float("nan")
        return round(math.log10(vb / va), 2)

    print("\nexponents (log10 of 10x-variant ratio; ~0 flat, 1 linear):")
    for op in ("changelog_join", "session_fold"):
        print(f"  {op}: keys10 state exp {exp(f'{op}/base', f'{op}/keys10', 'max_state')}, "
              f"time exp {exp(f'{op}/base', f'{op}/keys10', 'sec')}; "
              f"batch10 state exp {exp(f'{op}/base', f'{op}/batch10', 'max_state')}, "
              f"time exp {exp(f'{op}/base', f'{op}/batch10', 'sec')}")
    for label in ("nodedupwin", "dedupwin"):
        a, b = f"lsh_join_km/{label}/b{BASE_FILES}", f"lsh_join_km/{label}/b{BASE_FILES*10}"
        print(f"  lsh_join_km/{label}: batch10 state exp {exp(a, b, 'max_state')}, "
              f"time exp {exp(a, b, 'sec')}")


if __name__ == "__main__":
    main()
