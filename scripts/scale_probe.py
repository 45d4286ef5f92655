"""sf0.1 -> sf1 scale probe over the most expensive registry queries.

Times each query on TWO dirs produced by scripts/gen_scale_data.py (the
same generator at both SFs, so the ratio measures the engine, not a
distribution shift) and reports the wall-time scaling exponent
log10(t_sf1 / t_sf0.1) — 1.0 = linear, <1 = fixed-cost-dominated at
this size, >1 = superlinear (investigate: quadratic pair space, driver
state growing with N, a shuffle that stopped fitting).

Queries probed: the top pins from docs/PERF_BASELINE.md that read only
documents/embeddings (the generator's tables). Each timing is
min-of-2 warm (pass 0 discarded as codegen compile), measured with the
bench's own noop-sink write — never .count(), which lets Catalyst
prune computed output columns and under-reads expression-output
queries 4x+ (the binding r10 pin rule in docs/PERF_BASELINE.md).

Usage: python scripts/scale_probe.py [sf_small_dir sf_big_dir]
       (defaults /tmp/scale_sf0.1 /tmp/scale_sf1; generates if missing)
"""
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "cooccurrence_window",
    "kmeans_centroids",
    "substring_dedup_prep",
    "semdedup_join",
    "lm_ppl_frozen",
    "semdedup_embeddings",
    "ann_ivf_topk",
    "lm_ppl_kn",
    "jaccard_pairs",
    "simhash_pairs",
    # r11 additions: the new composed tokenizer row (bounded driver
    # merge loop) and gopher_filter after its spread fix
    "bpe_train_encode",
    "gopher_filter",
    # late r13: pmi after its count-relation pin (4-5 corpus passes
    # collapsed to 2) — probed because the plan changed shape
    "pmi_collocations",
]


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf1"
    here = os.path.dirname(os.path.abspath(__file__))
    for sf, d in ((0.1, small), (1.0, big)):
        if not os.path.exists(f"{d}/documents.parquet"):
            subprocess.check_call(
                [sys.executable, f"{here}/gen_scale_data.py", str(sf), d])

    import __spark_entry__ as entry
    from ksml_spark import get_spark

    spark = get_spark(app_name="scale-probe")
    qs = entry.queries()
    print(f"{'query':28s} {'t_sf0.1':>8s} {'t_sf1':>8s} {'ratio':>6s} {'exp':>5s}")
    for name in QUERIES:
        fn = qs[name]
        t = {}
        for d in (small, big):
            times = []
            for i in range(3):
                t0 = time.time()
                try:
                    (fn(spark, d).write.mode("overwrite")
                     .format("noop").save())
                except Exception as e:
                    print(f"{name:28s} FAILED on {d}: {type(e).__name__}: {e}")
                    times = None
                    break
                times.append(time.time() - t0)
            if times is None:
                break
            t[d] = min(times[1:])
        if len(t) == 2:
            ratio = t[big] / t[small]
            print(f"{name:28s} {t[small]:8.2f} {t[big]:8.2f} {ratio:6.2f} "
                  f"{math.log10(ratio):5.2f}")


if __name__ == "__main__":
    main()
