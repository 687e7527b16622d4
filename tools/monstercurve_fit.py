#!/usr/bin/env python3
"""Fit per-query cost exponents from EmptyInputProbe monstercurve output.

Reads MONSTERCURVE lines (ok/FAIL) produced by
`graft.tools.EmptyInputProbe <sfDir> monstercurve`, fits t ~ size^e per
query by least squares over log(size), log(t), and prints a sorted
table. Queries whose largest-size time is below `--floor` seconds are
reported as "flat" (exponent fit on sub-100ms timings is harness
jitter, not per-document cost).
"""
import argparse
import math
import re
import sys

LINE = re.compile(r"MONSTERCURVE ok (\S+) words=(\d+) sec=([0-9.]+)")
FAIL = re.compile(r"MONSTERCURVE FAIL (\S+) words=(\d+) (.*)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--floor", type=float, default=0.30,
                    help="max-size seconds below which a query is 'flat'")
    ap.add_argument("--warn", type=float, default=1.3,
                    help="exponent above which a query is flagged")
    args = ap.parse_args()

    times: dict[str, dict[int, float]] = {}
    fails: list[str] = []
    for line in open(args.log):
        if m := LINE.search(line):
            times.setdefault(m.group(1), {})[int(m.group(2))] = float(m.group(3))
        elif m := FAIL.search(line):
            fails.append(f"{m.group(1)} words={m.group(2)} {m.group(3)}")

    if not times and not fails:
        # a probe that died before emitting a single MONSTERCURVE line
        # (fixture-write OOM, bad path) must not gate green
        print("no MONSTERCURVE lines found — probe produced no output")
        sys.exit(1)

    if fails:
        print(f"FAILURES ({len(fails)}):")
        for f in fails:
            print(" ", f)

    fitted = []
    flat = 0
    incomplete = 0
    for q, pts in sorted(times.items()):
        if len(pts) < 3:
            print(f"  INCOMPLETE {q}: only sizes {sorted(pts)}")
            incomplete += 1
            continue
        sizes = sorted(pts)
        tmax = pts[sizes[-1]]
        if tmax < args.floor:
            flat += 1
            continue
        xs = [math.log(s) for s in sizes]
        ys = [math.log(max(pts[s], 1e-3)) for s in sizes]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        e = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / \
            sum((x - mx) ** 2 for x in xs)
        fitted.append((e, q, [pts[s] for s in sizes]))

    fitted.sort(reverse=True)
    print(f"\n{len(times)} queries: {flat} flat (<{args.floor}s at max size), "
          f"{len(fitted)} fitted, {len(fails)} failed")
    print(f"\n| query | 100k s | 250k s | 480k s | exponent |")
    print("|---|---|---|---|---|")
    for e, q, ts in fitted:
        mark = " **" if e > args.warn else ""
        print(f"| {q} | {ts[0]:.2f} | {ts[1]:.2f} | {ts[2]:.2f} | {e:.2f}{mark} |")
    worst = fitted[0][0] if fitted else 0.0
    print(f"\nworst exponent: {worst:.2f}")
    # A crashed or partially-run query is a totality regression, not a
    # fit-table footnote — it must fail the gate, not just print.
    if fails or incomplete:
        sys.exit(1)
    if any(e > args.warn for e, _, _ in fitted):
        sys.exit(2)


if __name__ == "__main__":
    main()
