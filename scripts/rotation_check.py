"""Verify the registry rotation invariant before round-end.

The correctness driver records the FIRST 50 registry entries per round
and evidence goes stale after 2 rounds, so with the registry at its
100-row cap the rotation is a zero-slack 50/50 flip-flop: each round's
head block must be exactly the set of rows whose last driver-green
evidence is about to go stale (= the rows of CORRECTNESS_r{N-2}.json),
and the tail must be exactly last round's window. This script does the
set arithmetic the round verdicts do by hand.

Usage: python scripts/rotation_check.py <stale_round_json> <fresh_round_json>
       e.g. python scripts/rotation_check.py CORRECTNESS_r10.json CORRECTNESS_r11.json
       (defaults: the two highest-numbered CORRECTNESS_r*.json present;
       if the newest artifact's keyset already equals the registry head —
       i.e. the current round's driver pass has been recorded — the pair
       swaps to (newest, second-newest), since post-round the head block
       IS the just-recorded window and the tail is last round's)

Exit 0 = rotation holds exactly; nonzero with a diff otherwise.
"""
import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> int:
    import __spark_entry__ as m

    names = list(m.queries())
    head, tail = set(names[:50]), set(names[50:])

    if len(sys.argv) > 2:
        stale_p, fresh_p = sys.argv[1], sys.argv[2]
    else:
        arts = sorted(
            glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json")),
            key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
        )
        if len(arts) < 2:
            print("need two CORRECTNESS_r*.json artifacts")
            return 2
        stale_p, fresh_p = arts[-2], arts[-1]
        # Post-round state: the newest artifact IS the head block the
        # driver just recorded; the stale side is then the newest and
        # the fresh side last round's (pre-round it's the other way).
        if set(json.load(open(arts[-1]))) == head:
            stale_p, fresh_p = arts[-1], arts[-2]
            print(f"note: newest artifact matches registry head "
                  f"(post-round state) — pairing ({os.path.basename(stale_p)}, "
                  f"{os.path.basename(fresh_p)})")
    stale = set(json.load(open(stale_p)))
    fresh = set(json.load(open(fresh_p)))

    # r14+: a round may swap head rows under the retirement clauses
    # (retire N rows whose ops keep evidence through other rows, register
    # N new rows). The swap is declared as ROTATION_SWAPS in
    # __spark_entry__; the expected head is then (stale − retired) ∪
    # added. Exact match (no swap this round) is still accepted first.
    swaps = getattr(m, "ROTATION_SWAPS", None) or {}
    retired = set(swaps.get("retired", ()))
    added = set(swaps.get("added", ()))
    stale_adj = (stale - retired) | added

    ok = True
    print(f"registry: {len(names)} rows; head block = first 50")
    if retired or added:
        print(f"declared swaps: retired={sorted(retired)} added={sorted(added)}")
    for label, want, got in (
        (f"head == {os.path.basename(stale_p)} window", stale, head),
        (f"tail == {os.path.basename(fresh_p)} window", fresh, tail),
    ):
        if want == got:
            print(f"OK    {label}")
        elif want is stale and got == stale_adj:
            print(f"OK    {label} (with declared swaps applied)")
        else:
            ok = False
            print(f"FAIL  {label}")
            if want - got:
                print(f"      missing: {sorted(want - got)}")
            if got - want:
                print(f"      extra:   {sorted(got - want)}")
    if len(names) != len(set(names)):
        ok = False
        print("FAIL  duplicate registry names")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
