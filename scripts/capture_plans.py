"""Capture .explain('formatted') for named registry queries into
plans/<tag>/<query>_<suffix>.txt — the judge-facing plan evidence for
optimization rounds.

Usage: python scripts/capture_plans.py <tag> <suffix> <query> [query ...]
       e.g. python scripts/capture_plans.py r17 before kmeans_centroids

Construction-time jobs (init collects, guard aggs) run as part of
building the DataFrame — that is the real query surface, so they run
here too. SF dir from $SPARK_GRAFT_SF_DIR (default sf0.1).
"""
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> int:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    import __spark_entry__ as entrymod
    from ksml_spark import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"capture-plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(HERE, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    qs = entrymod.queries()
    rc = 0
    for name in names:
        if name not in qs:
            print(f"unknown query: {name}", file=sys.stderr)
            rc = 1
            continue
        try:
            import contextlib
            import io

            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:
            plan = f"ERROR capturing plan: {type(e).__name__}: {e}"
            rc = 1
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan if plan.endswith("\n") else plan + "\n")
        print(f"wrote {path}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
