"""Substring-granularity dedup — the span-level pass that whole-document
MinHash misses (two documents sharing one long copied paragraph can sit
far below any document-level Jaccard threshold):

    1. `dup-spans`  scores every document by the fraction of its k-token
       spans repeated elsewhere in the corpus -> drop mostly-copied docs.
    2. `winnow` + `winnow-pairs`  find WHICH surviving documents share
       copied runs (MOSS fingerprints; candidate pairs by shared
       fingerprint count) -> the audit artifact for span-level overlap.

Both stages are postings-plan relational jobs: linear in total tokens,
never all-pairs, no Python in any hot path.

Run:  python examples/substring_dedup.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksml_spark import get_spark, pipe  # noqa: E402
from ksml_spark.sources.files import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="ksml-substring-dedup")
    docs = load_table(spark, sf_dir, "documents")

    # 1: span-duplication gate — drop docs that are >= 80% copied spans
    scored = pipe(
        ["stream", docs, {"key": "doc_id"}],
        ["dup-spans", {"col": "text", "id": "doc_id", "k": 3}],
        spark=spark,
    ).df
    kept_ids = scored.filter("dup_fraction < 0.8").select("doc_id")
    kept = docs.join(kept_ids, "doc_id", "semi")
    n_docs, n_kept = docs.count(), kept.count()
    print(f"span gate: kept {n_kept}/{n_docs} docs "
          f"({n_docs - n_kept} mostly-copied dropped)")

    # 2: span-overlap audit between survivors — pairs sharing >= 3
    # winnowing fingerprints, strongest overlap first
    pairs = pipe(
        ["stream", kept, {"key": "doc_id"}],
        ["winnow-pairs", {"col": "text", "id": "doc_id",
                          "k": 3, "window": 4, "min_shared": 3}],
        spark=spark,
    ).df
    print("top shared-run pairs among kept docs:")
    pairs.orderBy("n_shared", ascending=False).show(10)


if __name__ == "__main__":
    main()
