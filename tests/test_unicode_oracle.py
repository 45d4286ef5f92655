"""Adversarial-unicode oracle envelope (r14): the text-family registry
rows against hostile inputs — astral-plane emoji, RTL, unspaced CJK,
zero-width joiners, Turkish dotted I, 5000-char tokens, control chars,
NBSP boundaries, math-alphanumeric glyphs.

Pins BOTH sides of the adjudication in scripts/unicode_probe.py:
token_counts / lang_id / quality_scores / scrub_text / chunk_overlap
stay hash-exact against DuckDB on the ENTIRE adversarial corpus, and
the divergent set is EXACTLY the eight rows explained by the two
documented cross-engine unicode classes (JVM full vs utf8proc simple
case mapping; utf8proc vs ASCII trim whitespace). A new divergence OR
a resolved one both fail — either means an engine's unicode semantics
moved and the envelope note needs re-adjudication.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


def test_text_family_unicode_oracle_envelope(spark):
    import unicode_probe

    d = unicode_probe.build_dir()
    divergent = unicode_probe.compare(d)
    assert divergent == unicode_probe.EXPECTED_DIVERGENT, (
        f"unicode envelope drifted: "
        f"new={sorted(divergent - unicode_probe.EXPECTED_DIVERGENT)} "
        f"resolved={sorted(unicode_probe.EXPECTED_DIVERGENT - divergent)}"
    )
