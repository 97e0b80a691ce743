#!/usr/bin/env python3
"""Shuffle-volume regression gate: diff two ShuffleAudit snapshots.

Usage: python3 tools/shuffle_diff.py SHUFFLE_old.txt SHUFFLE_new.txt

Time-based gates (bench_diff.py) miss silent plan regressions — a lost
broadcast that doubles shuffle bytes can hide inside run-to-run timing
noise at small SF while being a disaster at 100 TB. Shuffle bytes are
deterministic for a deterministic plan, so the gate here is tight:
flag any query whose shuffle volume grew by >20% AND >1 MB (absolute
floor suppresses kilobyte jitter from AQE partition coalescing).
Exit 1 on any flag.
"""
import re, sys

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
    # removed/renamed queries are surfaced loudly: a rename would
    # otherwise let a regression hide as an unflagged "NEW" entry
    for name in sorted(set(old) - set(new)):
        print(f"REMOVED   {name}: was {old[name][0]:.2f} MB — renamed? compare manually")
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
        print(f"FAIL: {len(flagged)} shuffle regressions: {', '.join(flagged)}")
        sys.exit(1)

if __name__ == "__main__":
    main()
