"""Live incremental dedup — the streaming composition the r06 surface
enables: a STREAM of newly crawled documents is checked against a
static reference corpus with banded MinHash recall + exact Jaccard
precision, entirely as a stream-static equi-join (per-row HOF
signatures; no stateful aggregation).

    new docs (stream) --lsh-join{verify}--> (doc_a, doc_b, jaccard)
                                            = the audit artifact
    kept = new docs anti-join (verified dup ids)   [per micro-batch]

Run:  python examples/incremental_dedup.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksml_spark import get_spark, pipe  # noqa: E402
from ksml_spark.sources.files import load_table  # noqa: E402
from ksml_spark.streaming.runtime import file_stream_source  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="ksml-incremental-dedup")
    docs = load_table(spark, sf_dir, "documents")

    # reference corpus = even ids (static); "new crawl" = odd ids,
    # replayed as a file stream
    reference = docs.filter("doc_id % 2 = 0")
    new_docs = docs.filter("doc_id % 2 <> 0")
    stage = tempfile.mkdtemp(prefix="ksml_crawl_")
    new_docs.write.mode("overwrite").parquet(stage)
    stream = file_stream_source(spark, stage)

    dups = pipe(
        ["lsh-join",
         ["stream", stream, {"key": "doc_id"}],
         ["stream", reference, {"key": "doc_id"}],
         {"verify": 0.5}],
        spark=spark,
    ).df

    q = (dups.writeStream.format("memory").queryName("dup_audit")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    audit = spark.sql(
        "SELECT * FROM dup_audit ORDER BY jaccard DESC, doc_a, doc_b")
    n_dups = audit.count()
    print(f"verified near-duplicates against the reference: {n_dups}")
    audit.show(10)

    # the drop step (what a production job does per micro-batch in
    # foreach-batch): anti-join the crawl on the flagged ids
    kept = pipe(
        ["anti-join", ["stream", new_docs, {"key": "doc_id"}],
         ["select-key",
          ["stream", audit, {"key": "doc_a"}],
          ["key-value-mapper", {"doc_id": "doc_a"}]]],
        spark=spark,
    ).df
    print(f"crawl: {new_docs.count()} docs in, {kept.count()} kept")

    # substring-granularity variant: {"method": "winnow"} joins on
    # robust-winnowing fingerprints instead of MinHash bands, so a
    # crawl doc that merely COPIES A PARAGRAPH from the reference is
    # flagged even when whole-document similarity is low
    win = pipe(
        ["lsh-join",
         ["stream", new_docs, {"key": "doc_id"}],
         ["stream", reference, {"key": "doc_id"}],
         {"method": "winnow", "verify": 0.05}],
        spark=spark,
    ).df
    print(f"winnow-method (copied-run) candidates: {win.count()}")


if __name__ == "__main__":
    main()
