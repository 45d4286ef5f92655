"""Wordcount — the reference's README example re-expressed Spark-first.

Reference: /root/reference/README.md:59-68 — [:stream] -> [:flat-map-values]
-> [:group-by] -> [:count] -> [:to!] over Kafka topics. Here the same DSL
form runs over the driver testdata (or any parquet path passed as argv[1])
and prints the top 20 words.

Run:  python examples/wordcount.py [/root/testdata/sf0.001/documents.parquet]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksml_spark import get_spark, pipe  # noqa: E402


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/documents.parquet"
    spark = get_spark(app_name="ksml-wordcount")
    counts = pipe(
        ["stream", ["parquet", path], {"key": "doc_id"}],
        ["flat-map-values",
         ["value-mapper", "filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')"],
         {"as": "word"}],
        ["where", "word <> ''"],
        ["group-by", ["key-value-mapper", {"word": "word"}]],
        ["count"],
        spark=spark,
    )
    counts.df.orderBy("count", ascending=False).show(20)


if __name__ == "__main__":
    main()
