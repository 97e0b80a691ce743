#!/usr/bin/env python3
"""Compare two Bench JSON lines (or driver BENCH_r*.json files) and flag
per-query regressions.

Usage: python3 tools/bench_diff.py <old.json> <new.json> [threshold]

Accepts either the raw one-line Bench output or the driver's wrapper
({"tail": "..."} containing the line). Queries slower than
threshold x old (default 1.3) are listed; exits 1 if any regressed.
"""
import json
import re
import sys


def load(path):
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return d["queries"]
    out = {}
    # r8: the compact summary's `qcs` map (centisecond ints keyed by the
    # bare query number) is COMPLETE — use it as the base record
    parsed = d.get("parsed") if isinstance(d, dict) else None
    if isinstance(parsed, dict) and isinstance(parsed.get("qcs"), dict):
        out = {f"q{k}": ('"err"' if v < 0 else v / 100.0)
               for k, v in parsed["qcs"].items()}
    # driver wrapper: the full line inside "tail" (may be truncated at
    # the front) carries 3-decimal values — overlay the exact values it
    # still has over the centisecond base
    text = d.get("tail", raw) if isinstance(d, dict) else raw
    pairs = re.findall(r'"(q\w+)":([0-9.]+|"err")', text)
    out.update({k: (v if v == '"err"' else float(v)) for k, v in pairs})
    return out


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    # bench may use short keys (qNN) on one side — normalize
    def short(k):
        return k.split("_")[0]
    old = {short(k): v for k, v in old.items()}
    new = {short(k): v for k, v in new.items()}
    regressed = []
    for k in sorted(set(old) & set(new)):
        o, n = old[k], new[k]
        if not (isinstance(o, float) and isinstance(n, float)):
            continue
        if o >= 0.2 and n > o * thr:  # ignore sub-200ms noise
            regressed.append((k, o, n))
            print(f"REGRESSED {k}: {o:.2f}s -> {n:.2f}s ({n / o:.2f}x)")
    gone = set(old) - set(new)
    if gone:
        print("missing in new:", ",".join(sorted(gone)))
    tot_o = sum(v for v in old.values() if isinstance(v, float))
    tot_n = sum(v for k, v in new.items() if isinstance(v, float) and k in old)
    print(f"total (shared queries): {tot_o:.1f}s -> {tot_n:.1f}s")
    sys.exit(1 if regressed else 0)


if __name__ == "__main__":
    main()
