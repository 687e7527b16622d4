#!/usr/bin/env python3
"""One-time retroactive total_robust backfill for bench_out/bench_history.jsonl.

VERDICT r13 #4: total_robust (per query, min(in-sweep, isolated re-measure),
summed — see Bench.robustTotal) only exists on lines written since r13, so
cross-round recency windows and medians could not compare robust-to-robust.
This tool computes the SAME fold-in retroactively from each line's own
recorded "queries" and "isolated" maps and inserts a "total_robust" field.

Semantics mirror Bench.robustTotal exactly:
  robust = sum over queries of min(sweep_time, isolated.get(name, sweep_time))
Failed queries keep their in-sweep time-to-exception (the Scala side sums
them identically and flags them via "failed", never via the sum), and the
isolated map never contains failed re-runs by construction.

Edits are TEXTUAL inserts after the '"unit":"sec",' token so every other
byte of every line — raw values, field order, formatting — is untouched
for audit. Lines already carrying total_robust are left alone. Idempotent.
"""
import json
import sys

PATH = "bench_out/bench_history.jsonl"
ANCHOR = '"unit":"sec",'


def robust(j):
    iso = j.get("isolated") or {}
    return sum(min(s, iso.get(n, s)) for n, s in j["queries"].items())


def fmt(x):
    # match Scala's Double toString for the common cases: integral doubles
    # print with a trailing .0, everything else via repr (shortest roundtrip,
    # same contract as java.lang.Double.toString for these magnitudes)
    return repr(float(x))


def main():
    lines = open(PATH, encoding="utf-8").read().splitlines(keepends=True)
    out, touched, skipped = [], 0, 0
    for i, raw in enumerate(lines):
        stripped = raw.rstrip("\n")
        if not stripped.strip():
            out.append(raw)
            continue
        try:
            j = json.loads(stripped)
        except json.JSONDecodeError:
            out.append(raw)
            skipped += 1
            print(f"line {i + 1}: unparseable, left untouched", file=sys.stderr)
            continue
        if "total_robust" in j or not isinstance(j.get("queries"), dict) \
                or not isinstance(j.get("isolated"), dict):
            out.append(raw)
            continue
        if stripped.count(ANCHOR) != 1:
            out.append(raw)
            skipped += 1
            print(f"line {i + 1}: anchor not unique, left untouched", file=sys.stderr)
            continue
        r = robust(j)
        patched = stripped.replace(ANCHOR, ANCHOR + f'"total_robust":{fmt(r)},', 1)
        # sanity: the patched line must parse and carry exactly the computed value
        jp = json.loads(patched)
        assert jp["total_robust"] == float(fmt(r)), f"line {i + 1}: roundtrip mismatch"
        out.append(patched + ("\n" if raw.endswith("\n") else ""))
        touched += 1
    with open(PATH, "w", encoding="utf-8") as f:
        f.writelines(out)
    print(f"backfilled total_robust into {touched} line(s); "
          f"{skipped} left untouched (unparseable/anchor); "
          f"{len(lines) - touched - skipped} already complete or not applicable")


if __name__ == "__main__":
    main()
