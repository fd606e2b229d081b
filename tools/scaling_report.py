#!/usr/bin/env python3
"""Build SCALING.md: per-query wall-clock ratio sf0.1/sf0.01 vs the 10x
data ratio. Queries far below the data ratio are overhead-bound (fixed
scheduling/codegen cost dominates); anything superlinear (> data ratio)
is flagged for investigation.

Usage: scaling_report.py <bench_sf001.json> <bench_sf01.json> [out.md]
Each input is the graft.Bench stdout (last line = the JSON summary).
"""
import json
import sys


def load(path):
    last = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                last = line
    if last is None:
        raise SystemExit(f"no bench JSON line in {path}")
    return json.loads(last)


def main():
    small, big = load(sys.argv[1]), load(sys.argv[2])
    out = sys.argv[3] if len(sys.argv) > 3 else "SCALING.md"
    sq, bq = small["queries"], big["queries"]
    names = sorted(set(sq) & set(bq))
    rows = []
    for n in names:
        s, b = sq[n], bq[n]
        rows.append((n, s, b, (b / s) if s > 0 else float("inf")))
    rows.sort(key=lambda r: -r[3])
    data_ratio = 10.0
    super_ = [r for r in rows if r[3] > data_ratio]
    total_s = sum(r[1] for r in rows)
    total_b = sum(r[2] for r in rows)
    with open(out, "w") as f:
        f.write("# SCALING — per-query wall-clock ratio sf0.1 / sf0.01\n\n")
        f.write(
            "Data scales 10x between the two sweeps; a query whose time "
            "ratio is well under 10x is OVERHEAD-BOUND (fixed scheduling/"
            "codegen cost dominates its wall-clock and it will not be the "
            "bottleneck at scale); a ratio at ~10x is scan/data-bound (the "
            "healthy shape); a ratio ABOVE 10x is superlinear and needs a "
            "root cause. Both sweeps: graft.Bench min-of-2 interleaved "
            "cold-cache sweeps, local[32], run back-to-back on the same "
            "host.\n\n")
        f.write(f"- queries compared: **{len(rows)}**\n")
        f.write(f"- total wall-clock: {total_s:.1f}s at sf0.01 -> "
                f"{total_b:.1f}s at sf0.1 "
                f"(**{total_b / total_s:.2f}x** overall vs 10x data)\n")
        f.write(f"- superlinear (> 10x): **{len(super_)}**"
                + (" — " + ", ".join(r[0] for r in super_) if super_ else "")
                + "\n\n")
        f.write("| query | sf0.01 s | sf0.1 s | ratio | class |\n")
        f.write("|---|---|---|---|---|\n")
        for n, s, b, r in rows:
            cls = ("SUPERLINEAR" if r > data_ratio
                   else "data-bound" if r >= 5.0
                   else "mixed" if r >= 2.0
                   else "overhead-bound")
            f.write(f"| {n} | {s:.2f} | {b:.2f} | {r:.2f}x | {cls} |\n")
    print(f"wrote {out}: {len(rows)} queries, {len(super_)} superlinear")
    for n, s, b, r in super_:
        print(f"  SUPERLINEAR {n}: {s:.2f}s -> {b:.2f}s ({r:.1f}x)")


if __name__ == "__main__":
    main()
