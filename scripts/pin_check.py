"""Compare a bench artifact against docs/PERF_BASELINE.md's pin table.

Parses the markdown pin table (| name | seconds | note |), joins it with
a bench JSON's per-query seconds, and prints ratio stats + every row
over the 2x gate — the exact recomputation each round's verdict does by
hand. Retired pins (note contains 'RETIRED') and re-pinned-as rows are
skipped; bench queries with no pin are listed so new rows get pinned.

Usage: python scripts/pin_check.py [bench.json]
       (default docs/BENCH_FULL_LATEST.json)
"""
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_pins():
    pins = {}
    with open(os.path.join(HERE, "docs", "PERF_BASELINE.md")) as f:
        for line in f:
            m = re.match(r"\|\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|(.*)\|", line)
            if not m:
                continue
            name, val, note = m.group(1), float(m.group(2)), m.group(3)
            # skip retired rows and rows renamed away in ANY round
            # (ADVICE r11: the r08-only literal double-counted future
            # re-pin rounds)
            if "RETIRED" in note or re.search(r"re-pinned r\d+ as", note):
                continue
            pins[name] = val
    return pins


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        HERE, "docs", "BENCH_FULL_LATEST.json")
    with open(path) as f:
        bench = json.load(f)
    queries = bench.get("queries") or {}
    pins = load_pins()

    rows = []
    for name, sec in sorted(queries.items()):
        if sec is None:
            rows.append((name, None, None))
            continue
        pin = pins.get(name)
        rows.append((name, sec, (sec / pin) if pin else None))

    ratios = sorted(r for _, _, r in rows if r is not None)
    unpinned = [n for n, s, r in rows if r is None and s is not None]
    failed = [n for n, s, _ in rows if s is None]
    over = [(n, s, r) for n, s, r in rows if r is not None and r > 2.0]

    pin_sum_n = sum(s for n, s, r in rows if r is not None)
    pin_sum_d = sum(pins[n] for n, s, r in rows if r is not None)
    print(f"bench: {path}  suite={bench.get('value')}s  "
          f"n={bench.get('n_queries')}")
    print(f"pinned rows compared: {len(ratios)}")
    if ratios:
        import statistics

        med = statistics.median(ratios)
        print(f"median ratio {med:.2f}   pin-sum ratio "
              f"{pin_sum_n / pin_sum_d:.2f}   worst "
              f"{max(ratios):.2f}")
    print(f"rows over the 2x gate: {len(over)}")
    for n, s, r in sorted(over, key=lambda t: -t[2]):
        print(f"  {n}: {s}s = {r:.2f}x pin {pins[n]}")
    if unpinned:
        print(f"UNPINNED bench rows (pin them): {unpinned}")
    if failed:
        print(f"FAILED rows (no time recorded): {failed}")


if __name__ == "__main__":
    main()
