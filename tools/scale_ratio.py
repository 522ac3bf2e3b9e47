#!/usr/bin/env python3
"""Per-query scale-ratio analysis between two bench_detail.json files.

Usage: tools/scale_ratio.py <small_detail.json> <big_detail.json> [threshold]

Prints the ratio distribution (p50/p90, banded counts) and every key whose
big/small ratio exceeds the threshold (default 12 — the superlinear signal
used since the r7 sf1 sweep: 10x data with fixed overhead should land well
under 12x for linear operators).
"""
import json
import statistics
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0
    sq, bq = small["queries"], big["queries"]
    common = sorted(set(sq) & set(bq))
    ratios = {k: bq[k] / sq[k] for k in common if sq[k] > 0 and bq[k] > 0}
    vals = sorted(ratios.values())
    bands = [
        ("<=2x", sum(1 for v in vals if v <= 2)),
        ("2-5x", sum(1 for v in vals if 2 < v <= 5)),
        ("5-10x", sum(1 for v in vals if 5 < v <= 10)),
        (f"10-{thr:g}x", sum(1 for v in vals if 10 < v <= thr)),
        (f">{thr:g}x", sum(1 for v in vals if v > thr)),
    ]
    print(f"common={len(common)}  total {sum(sq[k] for k in common):.1f}s -> "
          f"{sum(bq[k] for k in common):.1f}s "
          f"({sum(bq[k] for k in common)/max(1e-9, sum(sq[k] for k in common)):.2f}x)")
    print(f"p50={statistics.median(vals):.2f}x  "
          f"p90={statistics.quantiles(vals, n=10)[8]:.2f}x  max={vals[-1]:.1f}x")
    print("  ".join(f"{name}: {n}" for name, n in bands))
    flagged = sorted(((v, k) for k, v in ratios.items() if v > thr), reverse=True)
    if flagged:
        print(f"\nkeys above {thr:g}x:")
        for v, k in flagged:
            print(f"  {k}: {sq[k]:.2f}s -> {bq[k]:.2f}s = {v:.1f}x")
    else:
        print(f"\nno key above {thr:g}x")


if __name__ == "__main__":
    main()
