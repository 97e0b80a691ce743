#!/usr/bin/env python3
"""Shuffle-volume regression gate: diff two ShuffleAudit snapshots.

Usage: python3 tools/shuffle_diff.py SHUFFLE_old.txt SHUFFLE_new.txt

Time-based gates (bench_diff.py) miss silent plan regressions — a lost
broadcast that doubles shuffle bytes can hide inside run-to-run timing
noise at small SF while being a disaster at 100 TB. Shuffle bytes are
deterministic for a deterministic plan, so the gate here is tight:
flag any query whose shuffle volume grew by >20% AND >1 MB (absolute
floor suppresses kilobyte jitter from AQE partition coalescing).
A query present in the old snapshot but absent from the new one is
also a failure (a query that starts crashing produces no parseable
line — that must not pass the gate); list intentional renames/removals
in RENAMED_OR_REMOVED below. Exit 1 on any flag.
"""
import re, sys

# Intentional renames/deletions: old-snapshot names the gate should not
# treat as failures. Add entries in the same commit that renames a query.
RENAMED_OR_REMOVED: set = set()

def load(path):
    out = {}
    for line in open(path):
        m = re.match(r"\[shuffle\] (\S+)\s+shuffle_mb=([\d.]+)\s+shuffle_rows=(\d+)", line)
        if m:
            out[m.group(1)] = (float(m.group(2)), int(m.group(3)))
    return out

def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    flagged = []
    # a query that disappears from the new snapshot (crashed mid-audit,
    # or renamed without updating RENAMED_OR_REMOVED) fails the gate —
    # measured-to-missing must not read as a pass
    for name in sorted(set(old) - set(new)):
        if name in RENAMED_OR_REMOVED:
            print(f"REMOVED   {name}: was {old[name][0]:.2f} MB (whitelisted rename/removal)")
        else:
            flagged.append(name)
            print(f"MISSING   {name}: was {old[name][0]:.2f} MB, absent from new snapshot "
                  f"— crashed? renamed? (whitelist in RENAMED_OR_REMOVED if intentional)")
    for name in sorted(new):
        if name not in old:
            print(f"NEW       {name}: {new[name][0]:.2f} MB")
            continue
        (omb, _), (nmb, _) = old[name], new[name]
        if nmb > omb * 1.2 and nmb - omb > 1.0:
            flagged.append(name)
            print(f"REGRESSED {name}: {omb:.2f} MB -> {nmb:.2f} MB ({nmb/max(omb,1e-9):.2f}x)")
        elif omb > nmb * 1.2 and omb - nmb > 1.0:
            print(f"IMPROVED  {name}: {omb:.2f} MB -> {nmb:.2f} MB")
    tot_o = sum(v[0] for k, v in old.items() if k in new)
    tot_n = sum(v[0] for k, v in new.items() if k in old)
    print(f"total (shared queries): {tot_o:.1f} MB -> {tot_n:.1f} MB")
    if flagged:
        print(f"FAIL: {len(flagged)} shuffle regressions/missing: {', '.join(flagged)}")
        sys.exit(1)

if __name__ == "__main__":
    main()
