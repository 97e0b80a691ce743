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
import os, re, subprocess, sys

# Intentional renames/deletions: old-snapshot names the gate should not
# treat as failures. Add entries in the same commit that renames a query.
RENAMED_OR_REMOVED: set = set()

# Known-bistable queries (r8 BENCHNOTES adjudication protocol,
# mechanized in r9): queries whose plan sits at a broadcast-estimate
# boundary and flips between two stable shuffle volumes with the SAME
# binary. Each entry maps query -> the set of adjudicated values (MB);
# a new reading within GATE tolerance of ANY adjudicated value passes
# as BISTABLE instead of failing. Add entries only with a bisect
# writeup in BENCHNOTES.md.
BISTABLE = {
    # sf0.1 lineitem (10.32 MiB) sits at the broadcast threshold: the
    # q21 semi-join side sometimes broadcasts (0.98 MB shuffled),
    # sometimes SMJs (10.44 MB). Both plans observed with both the r7
    # and r8 binaries; the SMJ variant is the shape that holds at
    # scale. BENCHNOTES.md "r8: the q81 shuffle-gate failure".
    "q81_tpch_q21": (0.98, 10.44),
}

def near(value, target):
    """GATE tolerance: within 20% or 1 MB of the adjudicated value."""
    return abs(value - target) <= max(0.2 * target, 1.0)

def remeasure(name, sf_dir=None):
    """Re-run ShuffleAudit for one query and return its fresh MB value
    (None if the re-measurement could not run or parse). A flagged
    reading can be a one-off plan flap (borderline broadcast estimate);
    the r8 adjudication protocol was two readings before believing one
    — this mechanizes reading #2. `sf_dir` is the NEW snapshot's
    recorded [shuffle-meta] provenance: the re-measurement must run at
    the snapshot's own scale factor, or a cross-SF reading (snapshot at
    sf1, machine default sf0.1) would sit far below the old baseline
    and mask every real regression as a flap. Disable with
    SHUFFLE_DIFF_NO_REMEASURE=1 (e.g. when diffing historical snapshots
    on a machine without the build/testdata)."""
    if os.environ.get("SHUFFLE_DIFF_NO_REMEASURE"):
        return None
    if sf_dir and not os.path.isdir(sf_dir):
        # snapshot from another machine: its recorded sf_dir does not
        # exist here, so a FAIL line below means "could not re-measure",
        # not "reproduced regression" — say so instead of failing mutely
        print(f"NOTE      {name}: snapshot sf_dir {sf_dir} not present on "
              f"this machine — flap re-measurement skipped; the flag below "
              f"is unverified, re-run the diff where the data exists")
        return None
    tools = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ,
               SPARK_GRAFT_FILTER=f"^{re.escape(name)}$",
               SPARK_GRAFT_SF_DIR=sf_dir or os.environ.get(
                   "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    try:
        out = subprocess.run(
            [os.path.join(tools, "run.sh"), "graft.tools.ShuffleAudit"],
            env=env, capture_output=True, text=True, timeout=600).stdout
    except Exception:
        return None
    m = re.search(rf"\[shuffle\] {re.escape(name)}\s+shuffle_mb=([\d.]+)", out)
    return float(m.group(1)) if m else None

def load(path):
    out, sf_dir = {}, None
    for line in open(path):
        meta = re.match(r"\[shuffle-meta\] sf_dir=(\S+)", line)
        if meta:
            sf_dir = meta.group(1)
        m = re.match(r"\[shuffle\] (\S+)\s+shuffle_mb=([\d.]+)\s+shuffle_rows=(\d+)", line)
        if m:
            out[m.group(1)] = (float(m.group(2)), int(m.group(3)))
    return out, sf_dir

def main():
    (old, old_sf), (new, new_sf) = load(sys.argv[1]), load(sys.argv[2])
    if old_sf and new_sf and old_sf != new_sf:
        # cross-SF diffs are meaningless byte-for-byte — refuse early
        # rather than flag everything (or worse, flap-pass everything)
        print(f"FAIL: snapshots taken at different scale factors "
              f"({old_sf} vs {new_sf}) — not comparable")
        sys.exit(1)
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
            if name in BISTABLE and any(near(nmb, v) for v in BISTABLE[name]):
                print(f"BISTABLE  {name}: {omb:.2f} MB -> {nmb:.2f} MB "
                      f"(adjudicated values: {BISTABLE[name]})")
                continue
            fresh = remeasure(name, new_sf)
            if fresh is not None and not (fresh > omb * 1.2 and fresh - omb > 1.0):
                print(f"FLAPPED   {name}: {omb:.2f} MB -> {nmb:.2f} MB, "
                      f"re-measured {fresh:.2f} MB — one-off plan flap, not a regression "
                      f"(if this recurs, bisect and consider a BISTABLE entry)")
                continue
            flagged.append(name)
            extra = f", re-measured {fresh:.2f} MB" if fresh is not None else ""
            print(f"REGRESSED {name}: {omb:.2f} MB -> {nmb:.2f} MB "
                  f"({nmb/max(omb,1e-9):.2f}x{extra})")
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
