"""End-to-end training-corpus preparation pipeline — the §2.10 surface
composed the way a real pretraining data job would:

    quality gate -> entropy/garbage filter -> paragraph cleanup ->
    exact near-dedup -> benchmark decontamination -> frozen classifier
    gate -> source mixing -> train/val/test split -> sequence packing ->
    seeded shuffle into shards

Run:  python examples/corpus_pipeline.py [sf_dir]   (default sf0.001)

Every step is a deterministic relational plan (no RNG, no Python in the
row path), so the pipeline yields byte-identical output on every run,
engine, and partitioning — the property that makes a 100 TB data recipe
reproducible.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksml_spark import get_spark, ksml, pipe  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark(app_name="corpus-pipeline")

docs = ["stream", ["parquet", f"{sf}/documents.parquet"], {"key": "doc_id"}]

# 1-3: per-document signals + cleanup, one scan
scored = pipe(
    docs,
    ["quality-score", {"col": "text", "as": "quality"}],
    ["entropy", {"col": "text", "unit": "char", "as": "ent"}],
    ["dedup-paragraphs", {"col": "text", "id": "doc_id"}],
    ["where", "quality >= 0.3 AND ent BETWEEN 2.0 AND 6.0"],
    spark=spark,
)

# 4: exact dedup on the normalized-text fingerprint (whitespace /
# punctuation-only edits collapse; keep lowest doc_id per group).
# For fuzzy near-dup removal swap in ["near-dedup", ...] — on this
# SYNTHETIC corpus (31-token vocabulary) token-set Jaccard merges
# nearly everything into one cluster, so the example keeps it exact.
deduped = pipe(
    ["fingerprint", scored, {"col": "text"}],
    ["dedup", {"by": "fingerprint", "order": "doc_id"}],
    spark=spark,
)

# 5: drop documents leaking benchmark n-grams (pseudo-benchmark split)
bench = ksml(["where", docs, "doc_id % 41 = 0"], spark=spark)
leaks = ksml(["decontaminate", deduped, bench, {"n": 3, "min_shared": 2}], spark=spark)
leak_keys = ksml(["select-key", leaks, ["key-value-mapper", {"doc_id": "corpus_id"}]],
                 spark=spark)
clean = ksml(["anti-join", deduped, leak_keys], spark=spark)

# 6: frozen linear quality classifier (fastText-style) — keep docs the
# model scores above threshold; the deterministic weight table stands in
# for trained weights (classify is model-agnostic: any (bucket, weight))
from pyspark.sql import functions as F  # noqa: E402

wtab = spark.range(512).select(
    F.col("id").alias("bucket"), (((F.col("id") % 97) - 48) / 100.0).alias("weight"))
clean = pipe(
    ["classify", clean, ["stream", wtab, {"key": "bucket"}],
     {"col": "text", "id": "doc_id", "buckets": 512, "threshold": 0.45}],
    ["where", "label = 1"],
    ["select-key", ["key-value-mapper", {"doc_id": "doc_id"}]],
    spark=spark,
)
clean = ksml(["join", deduped, clean], spark=spark)

# 7-10: weighted source mixture -> deterministic split -> packed chunks
final = pipe(
    ["mix", clean, {"by": "source",
                    "weights": {"src0": 3, "src1": 2, "src2": 1, "src3": 1},
                    "id": "doc_id", "salt": "mix-v1"}],
    ["hash-split", {"id": "doc_id", "salt": "split-v1",
                    "fractions": {"train": 0.9, "val": 0.05, "test": 0.05}}],
    ["token-count", {"col": "text"}],  # -> n_tokens_ws / n_tokens_bpe
    ["pack-chunks", {"tokens": "n_tokens_ws", "order": "doc_id",
                     "budget": 2048, "id": "doc_id"}],
    ["shuffle", {"id": "doc_id", "seed": 7, "shards": 4}],
    spark=spark,
)

final.df.select("doc_id", "source", "split", "n_tokens_ws", "chunk", "shard", "pos") \
    .orderBy("shard", "pos").show(10, truncate=False)
final.df.groupBy("split").count().show()
print("accounting: kept", final.df.count(), "docs")
