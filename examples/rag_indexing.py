"""RAG index preparation — the retrieval-side composition of the §2.10
surface (the sibling of examples/corpus_pipeline.py, which feeds
pretraining):

    fluency gate (lm-score) -> chunk (overlap windows) ->
    per-chunk dedup (fingerprint) -> keyword labels (tfidf-topk) ->
    lexical probe (bm25)

Every step is a registry operator; everything stays declarative
DataFrame plans end to end (no Python in any row path).

Run:  python examples/rag_indexing.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksml_spark import get_spark, pipe  # noqa: E402
from ksml_spark.sources.files import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="ksml-rag-indexing")
    docs = load_table(spark, sf_dir, "documents")

    # 1. fluency gate: drop the worst-perplexity tail (garbage text)
    scored = pipe(
        ["stream", docs, {"key": "doc_id"}],
        ["lm-score", {"col": "text", "id": "doc_id", "n": 2, "k": 0.1}],
        spark=spark,
    )
    kept_ids = pipe(["where", scored, "ppl <= 60"], spark=spark)

    # 2. chunk the kept documents into overlapping windows
    chunks = pipe(
        ["semi-join", ["stream", docs, {"key": "doc_id"}], kept_ids],
        ["chunk", {"col": "text", "size": 400, "overlap": 80, "as": "piece"}],
        ["with-column", "chunk_id", "doc_id * 100000 + chunk_idx"],
        spark=spark,
    )

    # 3. exact chunk dedup on the normalized fingerprint (boilerplate
    #    windows repeat across pages)
    deduped = pipe(
        ["fingerprint", chunks, {"col": "piece", "as": "fp"}],
        ["dedup", {"by": ["fp"], "order": ["chunk_id"]}],
        spark=spark,
    )

    # 4. keyword labels per chunk (smooth tf-idf top-3)
    keywords = pipe(
        ["tfidf-topk", deduped, {"col": "piece", "id": "chunk_id", "k": 3}],
        spark=spark,
    )

    # 5. lexical probe: score the deduped chunks against a query
    hits = pipe(
        ["bm25", deduped,
         {"col": "piece", "id": "chunk_id", "query": "stream join state"}],
        ["order-by", "-score"],
        ["limit", 5],
        spark=spark,
    )

    print("chunks kept:", deduped.df.count())
    keywords.df.show(9, truncate=40)
    hits.df.show()


if __name__ == "__main__":
    main()
