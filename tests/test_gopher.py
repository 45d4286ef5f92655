"""gopher-filter: the published Gopher quality rules (Rae et al. 2021,
Appendix A) as expression-only per-row annotations.

Parity strategy: an independent plain-Python reference implementation of
the documented semantics (raw whitespace tokens, non-overlapping '...'
counting plus '…', bullet/ellipsis LINE ratios over non-blank lines,
distinct stop-word membership on lowercased tokens) is evaluated over a
corpus crafted to trip each rule on both sides of its threshold, and the
Spark column expressions must agree row-by-row, rule-by-rule.
"""

from __future__ import annotations

import re

import pytest

from ksml_spark import ksml, pipe
from ksml_spark.errors import ArityError
from ksml_spark.functions.text import GOPHER_STOPWORDS

DEFAULTS = {
    "min_words": 50, "max_words": 100_000,
    "min_mean_word_len": 3.0, "max_mean_word_len": 10.0,
    "max_symbol_ratio": 0.1,
    "max_bullet_ratio": 0.9, "max_ellipsis_ratio": 0.3,
    "min_alpha_ratio": 0.8, "min_stopwords": 2,
}


def ref_gopher(text, t=DEFAULTS):
    """Plain-Python reference of the documented rule semantics."""
    if text is None:
        return {k: False for k in (
            "rule_word_count", "rule_mean_word_len", "rule_symbol_ratio",
            "rule_bullet_lines", "rule_ellipsis_lines", "rule_alpha_words",
            "rule_stopwords", "gopher_pass")}
    toks = [w for w in re.split(r"\s+", text) if w]
    nw = len(toks)
    mean_wlen = sum(len(w) for w in toks) / nw if nw else None
    hashes = text.count("#")
    ellipses = text.count("...") + text.count("…")  # str.count = non-overlapping
    lines = [ln for ln in text.split("\n") if ln.strip()]
    nl = len(lines)
    bullet = sum(bool(re.match(r"^\s*[-*•]", ln)) for ln in lines) / nl if nl else 0.0
    ell_ln = sum(bool(re.search(r"(\.\.\.|…)\s*$", ln)) for ln in lines) / nl if nl else 0.0
    alpha = sum(bool(re.search(r"[A-Za-z]", w)) for w in toks) / nw if nw else None
    n_stop = sum(1 for sw in GOPHER_STOPWORDS if sw in {w.lower() for w in toks})
    rules = {
        "rule_word_count": nw >= t["min_words"] and nw <= t["max_words"],
        "rule_mean_word_len": (mean_wlen is not None
                               and t["min_mean_word_len"] <= mean_wlen <= t["max_mean_word_len"]),
        "rule_symbol_ratio": nw > 0 and (hashes + ellipses) / nw <= t["max_symbol_ratio"],
        "rule_bullet_lines": bullet <= t["max_bullet_ratio"],
        "rule_ellipsis_lines": ell_ln <= t["max_ellipsis_ratio"],
        "rule_alpha_words": alpha is not None and alpha >= t["min_alpha_ratio"],
        "rule_stopwords": n_stop >= t["min_stopwords"],
    }
    rules["gopher_pass"] = all(rules.values())
    return rules


def good_doc(n=60):
    """n words, mean length in [3,10], has >=2 stopwords, all alpha."""
    return "the quick brown fox and friends " + " ".join(
        f"word{i}" for i in range(n - 6))


CORPUS = [
    (0, good_doc()),                                  # passes everything
    (1, "short doc"),                                 # fails word count
    (2, good_doc(49)),                                # one under min_words
    (3, good_doc(50)),                                # exactly min_words
    (4, " ".join(["ab"] * 60) + " the of"),           # mean word len < 3
    (5, " ".join(["hippopotamus" * 2] * 60) + " the of"),  # mean len > 10
    (6, good_doc(60) + " " + "# # # # # # #"),        # symbol ratio via '#'
    (7, good_doc(60) + " " + "... … .... x"),         # symbol ratio via both ellipses
    (8, "\n".join(["- bullet line " + good_doc(8)] * 9 + ["plain " + good_doc(8)])),
    (9, "\n".join(["• utf bullet " + good_doc(8)] * 10)),    # all-bullet: fails 0.9
    (10, "\n".join(["* star bullet"] * 5 + [good_doc(60)])),
    (11, "\n".join([good_doc(20) + " trailing..."] * 2 + [good_doc(20)] * 3)),
    (12, "\n".join([good_doc(20) + " dots… "] * 3 + [good_doc(20)] * 2)),  # 0.6 > 0.3
    (13, good_doc(40) + " " + " ".join(["12345"] * 20)),     # alpha ratio 40/60 < 0.8
    (14, " ".join([f"w{i}rd" for i in range(60)])),          # no stopwords at all
    (15, "the " * 60),                                # 1 DISTINCT stopword only
    (16, None),                                       # NULL text fails all
    (17, "   \n  \t "),                               # whitespace-only: 0 words, 0 lines
    (18, good_doc(55) + "\nplain line\n- one bullet of five lines\nmore text here\nlast line"),
]


@pytest.fixture(scope="module")
def gopher_out(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    out = pipe(["stream", df, {"key": "doc_id"}],
               ["gopher-filter", {"col": "text"}], spark=spark).df
    return {r["doc_id"]: r.asDict() for r in out.collect()}


RULE_COLS = ("rule_word_count", "rule_mean_word_len", "rule_symbol_ratio",
             "rule_bullet_lines", "rule_ellipsis_lines", "rule_alpha_words",
             "rule_stopwords", "gopher_pass")


def test_gopher_rules_match_python_reference(gopher_out):
    for doc_id, text in CORPUS:
        exp = ref_gopher(text)
        got = {k: gopher_out[doc_id][k] for k in RULE_COLS}
        assert got == exp, (doc_id, text, got, exp)


def test_gopher_corpus_trips_every_rule_both_ways(gopher_out):
    """The crafted corpus is only a parity harness if every rule sees
    both a pass and a fail somewhere in it."""
    for k in RULE_COLS:
        vals = {gopher_out[d][k] for d, _ in CORPUS}
        assert vals == {True, False}, (k, vals)


def test_gopher_specific_pins(gopher_out):
    """Hand-pinned expectations (independent of ref_gopher), covering
    the ellipsis-counting and bullet-matching subtleties."""
    # '...' counted non-overlapping ('....' is ONE ellipsis + a dot),
    # '…' counted per character: doc 7 tail = '... … .... x' -> 3
    # ellipses over 64 words -> ratio ~0.047 <= 0.1 BUT doc 6's 7 '#'
    # over 67 words ~0.104 > 0.1 fails
    assert gopher_out[7]["rule_symbol_ratio"] is True
    assert gopher_out[6]["rule_symbol_ratio"] is False
    # 9/10 bullet lines passes the (lenient) 0.9 default; 10/10 fails
    assert gopher_out[8]["rule_bullet_lines"] is True
    assert gopher_out[9]["rule_bullet_lines"] is False
    # '•' counts as a bullet marker (doc 9 used only '•')
    # 2/5 ellipsis-terminated lines passes 0.3? no: 0.4 > 0.3 fails;
    # '…' with trailing space still terminates a line (doc 12)
    assert gopher_out[11]["rule_ellipsis_lines"] is False
    assert gopher_out[12]["rule_ellipsis_lines"] is False
    # boundary: exactly min_words passes, one under fails
    assert gopher_out[3]["rule_word_count"] is True
    assert gopher_out[2]["rule_word_count"] is False
    # repeated 'the' is ONE distinct stopword -> fails min 2
    assert gopher_out[15]["rule_stopwords"] is False
    # NULL text fails every rule including the line-vacuous ones
    assert all(gopher_out[16][k] is False for k in RULE_COLS)
    # whitespace-only: no words (fails word rules) but zero LINES pass
    # the line-ratio rules vacuously
    assert gopher_out[17]["rule_word_count"] is False
    assert gopher_out[17]["rule_bullet_lines"] is True
    assert gopher_out[17]["rule_ellipsis_lines"] is True
    assert gopher_out[17]["gopher_pass"] is False
    assert gopher_out[0]["gopher_pass"] is True


def test_gopher_threshold_overrides_and_errors(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    # loosen min_words to 2: doc 1 now passes the word-count rule
    out = pipe(["stream", df, {"key": "doc_id"}],
               ["gopher-filter", {"thresholds": {"min_words": 2}}],
               spark=spark).df
    got = {r["doc_id"]: r["rule_word_count"] for r in out.collect()}
    assert got[1] is True
    for d, text in CORPUS:
        assert got[d] == ref_gopher(text, {**DEFAULTS, "min_words": 2})["rule_word_count"]
    # NULL text must fail EVERY rule even under a vacuous-making
    # override: with min_stopwords=0, n_stop on NULL text evaluates to
    # 0 (F.filter over the literal array gives an empty array, never
    # NULL), so only the explicit isNotNull guard keeps NULL -> False
    out0 = pipe(["stream", df, {"key": "doc_id"}],
                ["gopher-filter", {"thresholds": {"min_stopwords": 0}}],
                spark=spark).df
    texts = dict(CORPUS)
    nulls = {r["doc_id"]: r["rule_stopwords"]
             for r in out0.collect() if texts[r["doc_id"]] is None}
    assert nulls and all(v is False for v in nulls.values())
    with pytest.raises(ArityError, match="unknown thresholds.*min_wordz"):
        pipe(["stream", df, {"key": "doc_id"}],
             ["gopher-filter", {"thresholds": {"min_wordz": 2}}], spark=spark)
    with pytest.raises(ArityError, match="annotate.*or.*filter"):
        pipe(["stream", df, {"key": "doc_id"}],
             ["gopher-filter", {"action": "drop"}], spark=spark)
    clash = df.selectExpr("doc_id", "text", "true AS gopher_pass")
    with pytest.raises(ArityError, match="already exists"):
        pipe(["stream", clash, {"key": "doc_id"}],
             ["gopher-filter", {}], spark=spark)


def test_gopher_action_filter_drops_and_cleans(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    out = pipe(["stream", df, {"key": "doc_id"}],
               ["gopher-filter", {"action": "filter"}], spark=spark).df
    assert set(out.columns) == {"doc_id", "text"}
    keep = {r["doc_id"] for r in out.select("doc_id").collect()}
    exp = {d for d, text in CORPUS if ref_gopher(text)["gopher_pass"]}
    assert keep == exp and keep  # non-empty survivor set


def test_gopher_streaming_one_microbatch_parity(spark, tmp_path):
    """Pure per-row expressions: the streaming plan is the same
    shuffle-free codegen; values match batch bit-for-bit."""
    from ksml_spark.streaming.runtime import file_stream_source

    p = str(tmp_path / "gopher_docs")
    df = spark.createDataFrame([(d, t) for d, t in CORPUS], "doc_id long, text string")
    df.write.parquet(p)
    sout = pipe(["stream", file_stream_source(spark, p), {"key": "doc_id"}],
                ["gopher-filter", {}], spark=spark).df
    assert sout.isStreaming
    q = (sout.writeStream.format("memory").queryName("gopher_stream")
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {r["doc_id"]: tuple(r[k] for k in RULE_COLS) for r in
           spark.sql(f"SELECT * FROM gopher_stream").collect()}
    exp = {d: tuple(ref_gopher(t)[k] for k in RULE_COLS) for d, t in CORPUS}
    assert got == exp
