"""Smoke tests for the shipped examples: each runs end-to-end at
sf0.001 against the driver testdata and prints non-empty output.
Examples are user-facing code; without this they rot silently
(VERDICT r06). Runs in-process (runpy + shared SparkSession), so the
cost is the queries, not five JVM startups."""

from __future__ import annotations

import os
import runpy
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "examples")
SF_DIR = "/root/testdata/sf0.001"

_ARGS = {
    # wordcount takes a parquet file path, the rest take an sf dir
    "wordcount.py": [os.path.join(SF_DIR, "documents.parquet")],
    "anomaly_detection.py": [SF_DIR],
    "corpus_pipeline.py": [SF_DIR],
    "incremental_dedup.py": [SF_DIR],
    "rag_indexing.py": [SF_DIR],
    "semantic_dedup.py": [SF_DIR],
    "substring_dedup.py": [SF_DIR],
    "tokenizer_training.py": [SF_DIR],
}


def test_every_example_is_covered():
    shipped = {f for f in os.listdir(EXAMPLES_DIR) if f.endswith(".py")}
    assert shipped == set(_ARGS), (
        "examples/ and the smoke-test matrix drifted apart: "
        f"{shipped.symmetric_difference(set(_ARGS))}"
    )


# the two multi-stage pipeline examples carry most of the smoke-test
# cost (~40s/35s of the file's ~95s) — slow tier; the other six stay in
# the fast default tier so examples keep per-round driver coverage
_SLOW_EXAMPLES = {"corpus_pipeline.py", "semantic_dedup.py"}


@pytest.mark.parametrize(
    "name",
    [pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_EXAMPLES else n
     for n in sorted(_ARGS)],
)
def test_example_runs_and_prints(spark, name, capsys):
    if not os.path.isdir(SF_DIR):
        pytest.skip("sf0.001 testdata not present")
    path = os.path.join(EXAMPLES_DIR, name)
    argv0 = sys.argv
    sys.argv = [path] + _ARGS[name]
    try:
        # run_name="__main__" fires the main() guard; module-level
        # scripts (corpus_pipeline) execute either way. The session
        # fixture is reused via get_spark's getOrCreate.
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = argv0
    out = capsys.readouterr().out
    assert len(out.strip()) > 20, f"{name} printed nothing useful:\n{out!r}"
