#!/usr/bin/env python3
"""Diff two bench_detail.json files per query key and fail loudly on blowups.

Usage:
    python3 tools/bench_diff.py OLD.json NEW.json [--factor 2.0] [--floor 0.5]

OLD/NEW can be paths or git revs of the committed detail, e.g.:
    git show 7f6720b:bench_detail.json > /tmp/r3.json
    python3 tools/bench_diff.py /tmp/r3.json bench_detail.json

A key "regresses" when new >= factor * old AND new >= floor seconds (the
floor suppresses 0.1 s -> 0.3 s jitter on trivial queries). Exit code 1 if
any key regresses, so the round notes can gate on it. Added/removed keys
are listed informationally and never fail the check.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)["queries"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--factor", type=float, default=2.0)
    ap.add_argument("--floor", type=float, default=0.5)
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    shared = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    # old == 0.0 means the key FAILED in the old sweep (Bench records 0.0
    # and lists it under "failures") — a now-working key is a fix, not a
    # regression, and n/o would divide by zero
    fixed = [k for k in shared if old[k] == 0.0 and new[k] > 0.0]
    regressed = [
        (k, old[k], new[k])
        for k in shared
        if old[k] > 0.0 and new[k] >= args.factor * old[k] and new[k] >= args.floor
    ]
    improved = [
        (k, old[k], new[k])
        for k in shared
        if old[k] >= args.factor * new[k] and old[k] >= args.floor
    ]

    tot_old = sum(old[k] for k in shared)
    tot_new = sum(new[k] for k in shared)
    print(f"shared keys: {len(shared)}  total {tot_old:.1f}s -> {tot_new:.1f}s "
          f"({tot_new / tot_old - 1:+.0%} vs old)" if tot_old else "no shared keys")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}  "
              f"[+{sum(new[k] for k in added):.1f}s]")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    if fixed:
        print(f"previously failed, now measured ({len(fixed)}): {', '.join(fixed)}")
    if improved:
        print(f"\nimproved >= {args.factor}x ({len(improved)}):")
        for k, o, n in sorted(improved, key=lambda t: t[1] - t[2]):
            print(f"  {k:32s} {o:7.2f}s -> {n:6.2f}s")
    if regressed:
        print(f"\nREGRESSED >= {args.factor}x ({len(regressed)}):")
        for k, o, n in sorted(regressed, key=lambda t: t[1] - t[2]):
            print(f"  {k:32s} {o:7.2f}s -> {n:6.2f}s  ({n / o:.1f}x)")
        sys.exit(1)
    print("\nno per-key regressions")


if __name__ == "__main__":
    main()
