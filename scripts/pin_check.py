"""Compare a bench artifact against docs/PERF_BASELINE.md's pin table.

Parses the markdown pin table (| name | seconds | note |), joins it with
a bench JSON's per-query seconds, and prints ratio stats + every row
over the 2x gate — the exact recomputation each round's verdict does by
hand. Retired pins (note contains 'RETIRED') and re-pinned-as rows are
skipped; bench queries with no pin are listed so new rows get pinned.

r15 additions (VERDICT r14 #1/#5):
- host-heat adjudication: if the bench artifact carries a "calib" row
  (bench.py's constant-work reference) and PERF_BASELINE.md pins it
  ("Calibration pin: X"), the heat factor calib/pin is printed along
  with heat-normalized ratio stats — a uniform host shift then reads as
  heat, not regression, inside the artifact itself.
- stale-epoch flag: any live pin still sourced at the r01/r02 driver
  epoch (pre the r10 isolated noop-write min-of-warm methodology) is
  listed — those pins measured a different thing than today's bench and
  are the documented gate-noise source; re-pin them.

Usage: python scripts/pin_check.py [bench.json]
       (default docs/BENCH_FULL_LATEST.json)
"""
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_pins():
    """Returns (pins, stale_epoch, calib_pin): live pin values, the
    subset still sourced at the r01/r02 epoch (note begins 'r01' or
    'r02 local' with no later re-measure note), and the calibration
    pin ('Calibration pin: X') or None."""
    pins, stale, calib_pin, calib_py_pin = {}, [], None, None
    with open(os.path.join(HERE, "docs", "PERF_BASELINE.md")) as f:
        for line in f:
            c = re.search(r"Calibration pin:\s*([0-9.]+)", line)
            if c:
                calib_pin = float(c.group(1))
            cp = re.search(r"Python-stage calibration pin:\s*([0-9.]+)", line)
            if cp:
                calib_py_pin = float(cp.group(1))
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
            if re.match(r"\s*r0[12]\b", note) and "re-pin" not in note \
                    and "re-measure" not in note and "adjudicat" not in note:
                stale.append(name)
    return pins, stale, calib_pin, calib_py_pin


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        HERE, "docs", "BENCH_FULL_LATEST.json")
    with open(path) as f:
        bench = json.load(f)
    queries = bench.get("queries") or {}
    pins, stale_epoch, calib_pin, calib_py_pin = load_pins()

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
    heat = None
    calib = bench.get("calib")
    if calib is not None and calib_pin:
        heat = calib / calib_pin
        print(f"calibration: {calib}s vs pin {calib_pin}s -> host-heat "
              f"factor {heat:.2f}")
    elif calib is not None:
        print(f"calibration: {calib}s (no pin in PERF_BASELINE.md yet)")
    calib_py = bench.get("calib_py")
    if calib_py is not None and calib_py_pin:
        print(f"py calibration: {calib_py}s vs pin {calib_py_pin}s -> "
              f"Python-worker heat factor {calib_py / calib_py_pin:.2f} "
              "(adjudicates Arrow/pandas-stage rows the JVM calib "
              "cannot see)")
    elif calib_py is not None:
        print(f"py calibration: {calib_py}s (no pin in PERF_BASELINE.md yet)")
    print(f"pinned rows compared: {len(ratios)}")
    if ratios:
        import statistics

        med = statistics.median(ratios)
        print(f"median ratio {med:.2f}   pin-sum ratio "
              f"{pin_sum_n / pin_sum_d:.2f}   worst "
              f"{max(ratios):.2f}")
        if heat:
            print(f"heat-normalized: median {med / heat:.2f}   pin-sum "
                  f"{pin_sum_n / pin_sum_d / heat:.2f}   (gate reads: a "
                  "row over 2x raw but under 2x normalized on a hot box "
                  "is host noise — re-measure isolated before calling "
                  "it a regression)")
    print(f"rows over the 2x gate: {len(over)}")
    for n, s, r in sorted(over, key=lambda t: -t[2]):
        extra = f" ({r / heat:.2f}x heat-normalized)" if heat else ""
        print(f"  {n}: {s}s = {r:.2f}x pin {pins[n]}{extra}")
    if unpinned:
        print(f"UNPINNED bench rows (pin them): {unpinned}")
    if failed:
        print(f"FAILED rows (no time recorded): {failed}")
    if stale_epoch:
        print(f"STALE-EPOCH pins (r01/r02 source, pre the r10 isolated "
              f"noop-write methodology — re-pin): {sorted(stale_epoch)}")
    else:
        print("stale-epoch pins: none (every live pin is on the r10+ "
              "methodology)")


if __name__ == "__main__":
    main()
