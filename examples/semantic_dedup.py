"""Semantic deduplication (SemDeDup, Abbas et al. 2023) over the
embeddings table — the embedding-space sibling of
examples/incremental_dedup.py's lexical MinHash path:

    deterministic centroid sample -> nearest-centroid assignment ->
    within-cluster cosine suppression (keep the LEAST prototypical
    member of each duplicate group) -> survivor corpus

One declarative plan end to end; the pair stage is the paper's
O(sum c_k^2 / K) within-cluster matrix, keyed on (cluster, rank-block)
so a mis-sampled hot cluster still fans out across tasks. The last
stage shows `semdedup-join`: incremental cross-corpus dedup of NEW
vectors against a frozen reference corpus (the streaming shape).

Run:  python examples/semantic_dedup.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ksml_spark import get_spark, ksml, pipe  # noqa: E402
from ksml_spark.sources.files import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="ksml-semantic-dedup")
    emb = load_table(spark, sf_dir, "embeddings")

    # annotate: every vector with its cluster, centroid similarity, and
    # the keep/drop verdict (threshold 0.3 suits the near-isotropic
    # synthetic embeddings; real-corpus operating points sit ~0.9)
    annotated = ksml(
        ["semdedup", ["stream", emb, {"key": "vec_id"}],
         {"id": "vec_id", "vec": "embedding", "dim": 64,
          "centroids": "vec_id % 127 = 3", "threshold": 0.3}],
        spark=spark,
    )
    annotated.df.groupBy("keep").agg(
        F.count("*").alias("n"),
        F.round(F.avg("sim_centroid"), 4).alias("avg_centroid_sim"),
    ).orderBy("keep").show()

    # filter: the survivor corpus, rejoined to the vectors — what a
    # pretraining pipeline would hand to the next stage
    survivors = pipe(
        ["stream", emb, {"key": "vec_id"}],
        ["semdedup", {"id": "vec_id", "vec": "embedding", "dim": 64,
                      "centroids": "vec_id % 127 = 3", "threshold": 0.3,
                      "action": "filter"}],
        spark=spark,
    )
    kept = survivors.df.join(emb, "vec_id").select("vec_id", "label", "cluster")
    total, n_kept = emb.count(), kept.count()
    print(f"semantic dedup: kept {n_kept}/{total} vectors "
          f"({100.0 * n_kept / total:.1f}% retention)")
    kept.orderBy("vec_id").show(5)

    # cross-corpus: dedup NEW vectors (odd ids) against a static
    # REFERENCE corpus (even ids) — semdedup-join is the stream-legal
    # path (the new side may be a readStream; the reference must be
    # batch). The reference always wins: a new row drops when any
    # same-cluster reference member reaches the threshold, and new rows
    # never suppress each other.
    incoming = ksml(
        ["semdedup-join",
         ["where", ["stream", emb, {"key": "vec_id"}], "vec_id % 2 = 1"],
         ["where", ["stream", emb, {"key": "vec_id"}], "vec_id % 2 = 0"],
         {"id": "vec_id", "vec": "embedding", "dim": 64,
          "centroids": "vec_id % 126 = 2", "threshold": 0.3,
          # late r13: the single-cluster dup test misses near-dups
          # straddling a cluster boundary (measured: 31% missed at
          # K~15, worse at higher K); nprobe widens the test to the
          # top-p clusters' members — recall-sensitive batch sweeps
          # run nprobe 4-8, streams keep the default 1
          "nprobe": 4}],
        spark=spark,
    )
    incoming.df.groupBy("keep").count().orderBy("keep").show()

    # r12: the SemDeDup paper's refine-then-dedup loop — Lloyd-refine
    # the centroid sample first, then cluster against the refined
    # RELATION (the centroid-table operand; a persisted table works the
    # same — train once, dedup every new corpus against it)
    refined = ksml(
        ["kmeans-centroids", ["stream", emb, {"key": "vec_id"}],
         {"id": "vec_id", "vec": "embedding", "dim": 64,
          "init": "vec_id % 127 = 3", "iters": 3}],
        spark=spark,
    )
    refined_dedup = ksml(
        ["semdedup", ["stream", emb, {"key": "vec_id"}], refined,
         {"id": "vec_id", "vec": "embedding", "dim": 64,
          "threshold": 0.3}],
        spark=spark,
    )
    refined_dedup.df.groupBy("keep").count().orderBy("keep").show()


if __name__ == "__main__":
    main()
