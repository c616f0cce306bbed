#!/usr/bin/env python3
"""Diff the four legs written by tools/ab_bench.sh: per entry, min over the
two A legs vs min over the two B legs (each leg is itself a min-of-2 inside
graft.Bench), so one contention burst cannot hit every reading of a side."""
import json
import sys


def q(path):
    return json.load(open(path))["queries"]


def main(prefix):
    a = [q(f"{prefix}_A1.json"), q(f"{prefix}_A2.json")]
    b = [q(f"{prefix}_B1.json"), q(f"{prefix}_B2.json")]
    names = sorted(a[0])
    rows = []
    for n in names:
        va = [x[n] for x in a if x[n] >= 0]
        vb = [x[n] for x in b if x[n] >= 0]
        if not va or not vb:
            print(f"SKIP {n}: failed in some leg (A={va}, B={vb})")
            continue
        av, bv = min(va), min(vb)
        rows.append((bv - av, n, av, bv))
    rows.sort()
    ta = tb = 0.0
    print(f"{'entry':30s} {'base':>8s} {'head':>8s} {'delta':>8s}")
    for d, n, av, bv in rows:
        ta += av
        tb += bv
        print(f"{n:30s} {av:8.3f} {bv:8.3f} {d:+8.3f}")
    print(f"{'TOTAL':30s} {ta:8.3f} {tb:8.3f} {tb - ta:+8.3f}")


if __name__ == "__main__":
    main(sys.argv[1])
