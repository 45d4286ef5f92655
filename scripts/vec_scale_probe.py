"""Vector-axis scale probe: embeddings 1x -> 10x -> 30x, documents held
constant (VERDICT r11 item 6).

The batch probe (scripts/scale_probe.py) scales documents AND vectors
together with sf, and the registry's `init: vec_id % 127 = 3` sampling
grows K with N — so cluster sizes stay ~flat there by construction.
This probe isolates the axis that actually grows in an embedding-heavy
pipeline: the VECTOR COUNT, at 2k / 20k / 60k rows (the driver table is
a fixed 2k at every bundled SF), over the four vector-query families:

  semdedup_embeddings   broadcast assign + rank-block pair agg
  ann_ivf_topk          IVF bucketed probe
  kmeans_centroids      bounded-driver Lloyd (3 iters)
  vec_project_embeddings  zero-exchange JL projection (never probed
                          before r12)

Registry queries keep their %127 sampling, so K grows with N here too —
that IS the documented operating regime (the SemDeDup paper's K knob;
a FIXED K on a growing corpus is the guarded misuse: max_cluster_pairs
refuses it, measured in the skew bench). Exponents therefore read the
engine's behavior in the regime the ops prescribe at 100 TB.

Timing is the bench's own noop-sink write, min-of-2 warm (pass 0
discarded as codegen compile). exp = log10(ratio)/log10(size ratio):
1.0 = linear in vectors, <1 fixed-cost-dominated, >1 superlinear.

Usage: python scripts/vec_scale_probe.py [base_dir]
       (default /tmp/vecscale; generates embeddings dirs if missing)
"""
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "vec_project_embeddings",
    "kmeans_centroids",
    "semdedup_embeddings",
    "ann_ivf_topk",
    # r13 additions — the bucket-join families were never probed on
    # this axis: ann_lsh_topk is the claimed ~N/2^dims-per-query scale
    # path (exp should stay well under ann_topk's by-design O(N*Q)).
    "ann_lsh_topk",
    # the documented O(N*Q) exact baseline, probed for the record: its
    # exponent SHOULD read ~superlinear (queries grow with N too) —
    # that is the brute-force contract, ann-lsh/ivf are the scale paths
    "ann_topk",
    # neardup_embeddings was probed ONCE here (r13): exp 0.99 -> 1.78
    # (1.6s -> 108s at 60k vectors over 4 constant semantic blocks) —
    # the measurement that motivated the max_block_pairs guard, which
    # now REFUSES the 30x shape (est ~112M pairs in one block > 1e8),
    # so the row is deliberately NOT in the default list anymore.
]

# (label, vec_sf): 2k / 20k / 60k vectors; documents constant at sf0.1
STEPS = [("1x", 0.1), ("10x", 1.0), ("30x", 3.0)]


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vecscale"
    here = os.path.dirname(os.path.abspath(__file__))
    dirs = {}
    for label, vec_sf in STEPS:
        d = os.path.join(base, label)
        if not os.path.exists(f"{d}/embeddings.parquet"):
            subprocess.check_call(
                [sys.executable, f"{here}/gen_scale_data.py", "0.1", d,
                 str(vec_sf)])
        dirs[label] = d

    import __spark_entry__ as entry
    from ksml_spark import get_spark

    spark = get_spark(app_name="vec-scale-probe")
    qs = entry.queries()
    head = f"{'query':26s}" + "".join(f" {l:>8s}" for l, _ in STEPS)
    print(head + "  exp(1x->10x)  exp(10x->30x)")
    for name in QUERIES:
        fn = qs[name]
        t = {}
        for label, _ in STEPS:
            times = []
            for i in range(3):
                t0 = time.time()
                try:
                    (fn(spark, dirs[label]).write.mode("overwrite")
                     .format("noop").save())
                except Exception as e:
                    print(f"{name:26s} FAILED on {label}: "
                          f"{type(e).__name__}: {e}")
                    times = None
                    break
                times.append(time.time() - t0)
            if times is None:
                break
            t[label] = min(times[1:])
        if len(t) == len(STEPS):
            e1 = math.log10(t["10x"] / t["1x"]) / math.log10(10)
            e2 = math.log10(t["30x"] / t["10x"]) / math.log10(3)
            print(f"{name:26s}" + "".join(
                f" {t[l]:8.2f}" for l, _ in STEPS)
                + f"  {e1:12.2f}  {e2:13.2f}")


if __name__ == "__main__":
    main()
