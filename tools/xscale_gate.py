#!/usr/bin/env python3
"""Cross-scale shuffle-ratio gate: every key whose shuffle bytes grow
faster than the data decade MUST carry an in-file adjudication, or the
gate fails (the PlanAudit whitelist discipline, applied to the r14
cross-scale table — VERDICT r14 item 1: a written record that names 5
of 15 flagged keys is not doing its job).

Usage: python3 tools/xscale_gate.py SHUFFLE_small.txt SHUFFLE_big.txt

The two snapshots must be ONE decade apart (sf0.1 vs sf1). For every
query present in both:

  ratio = big_bytes / small_bytes

Keys with ratio > THRESH (12x: the decade plus AQE/partial-agg slack)
are FLAGGED and must appear in ADJUDICATIONS below. Each adjudication
declares its mechanism; mechanisms that are mechanically checkable are
checked:

  rows-transition  partial-aggregation keys-bound -> rows-bound: at the
                   small SF the map-side combine collapses to (distinct
                   keys x splits); at the decade per-split key
                   multiplicity approaches 1 and the shuffle approaches
                   input rows (thin key+state payload). Worst case is
                   LINEAR in input rows — not a scale-killer. Checked:
                   bytes ratio within 2x of ROWS ratio (growth is row
                   count, not width — a width blow-up would be a
                   different, unadjudicated problem), plus FlipProbe
                   join-shape parity recorded in `evidence`.
  build-density    index/graph construction whose candidate volume
                   grows with data density (e.g. NN-Descent proposals);
                   bounded by a written cap or watch note. Checked:
                   bytes ratio within 2x of rows ratio.

Noise floors: keys are compared only when the BIG snapshot moved at
least MIN_BIG_MB (0.5 MB) — below that the printed 2-decimal MB values
quantize to garbage ratios (0.00 -> 0.01 reads as infinity) and the
absolute volume is irrelevant at any scale.

Staleness: an ADJUDICATIONS entry whose key is no longer flagged
(ratio < 0.8 * THRESH, or missing from either snapshot) FAILS the gate
— records must be corrected in the same commit that changes the
behavior, not left to rot (the r14 lesson).

Exit 0 = every flagged key adjudicated + consistency checks pass +
no stale entries.
"""
import re
import sys

THRESH = 12.0        # decade + partial-agg/AQE slack
MIN_BIG_MB = 0.5     # ignore keys still tiny at the decade
STALE_BELOW = 0.8 * THRESH
ROWS_CONSISTENCY = 2.0  # bytes ratio must be within 2x of rows ratio

# Every >THRESH key carries (mechanism, evidence). Mechanisms:
# "rows-transition" | "build-density" (see module docstring).
# Evidence strings cite the probe artifact backing the adjudication.
ADJUDICATIONS = {
    # --- r14 originals (BENCHNOTES r14, FlipProbe five) -----------------
    "q18_in_subquery": ("rows-transition",
        "FlipProbe r14+r15: bhj/smj identical sf0.1/sf1; distinct "
        "l_orderkey IN-set partial agg; sf1 rows 4.5M ~= lineitem rows. "
        "sf10: bhj->smj flip (semi side outgrew broadcast) — the correct "
        "scale plan, both SMJ sides row-linear; 16.1x rows/decade"),
    "q19_correlated_subquery": ("rows-transition",
        "FlipProbe r14+r15: join counts identical sf0.1/sf1; "
        "per-orderkey avg partial agg, keys ~= orders cardinality. "
        "sf10: bhj->smj flip — sf1 was keys-bound AND broadcast, sf10 "
        "rows-bound AND shuffle-join (98M rows ~= lineitem+orders+agg, "
        "each exchange row-linear)"),
    "q20_cte": ("rows-transition",
        "FlipProbe r14+r15: ZERO joins at every scale (bhj=0 smj=0); "
        "CTE group-by over order keys, STILL keys-bound at sf1 (292k << "
        "15M orders) — transition lands on the sf1->sf10 decade "
        "(10.8M ~= 73% of orders ceiling), next decade forced ~10x"),
    "q25_having": ("rows-transition",
        "FlipProbe r14+r15: ZERO joins at every scale; group-by custkey "
        "partial agg — same one-decade-later transition as q20 "
        "(sf10 rows 11M ~= orders ceiling)"),
    "q75_tpch_q10": ("rows-transition",
        "FlipProbe r14+r15: sf0.1/sf1 identical (bhj=3); sf10 one "
        "bhj->smj flip (customer side 1.5M rows outgrew broadcast) — "
        "SMJ shuffles customer+orders+lineitem, all row-linear; the "
        "142x is broadcast-free-lunch ending, not super-linearity"),
    # --- r15 backfill (VERDICT r14 item 1: the ten missing keys) --------
    "q118_sparse_cosine": ("rows-transition",
        "FlipProbe r15: bhj=1/smj=0 both scales; stage-1 thin "
        "pair-candidate agg keyed by l_orderkey (~1.5M keys at sf1) — "
        "per-split multiplicity ~1 at the decade, shuffle ~ input rows "
        "(6.6M thin rows / 54 MB); downstream stays <=400-row broadcast"),
    "q49_approx_sketches": ("rows-transition",
        "FlipProbe r15: bhj=1/smj=0 both scales; countDistinct(l_partkey) "
        "expands to a distinct agg on (returnflag, partkey) — 200k x 3 "
        "keys at sf1, rows-bound (2.9M); HLL register agg stays 256-row"),
    "q79_tpch_q15": ("rows-transition",
        "FlipProbe r15: bhj=2/smj=0 both scales; revenue group-by "
        "l_suppkey: sf0.1 keys-bound (2002 = 1k keys x 2 splits), sf1 "
        "116k < keys x splits bound (10k x 32)"),
    "q100_array_funcs2": ("rows-transition",
        "FlipProbe r15: bhj=1/smj=0 both scales; TopKeys.smallest "
        "DISTINCT l_orderkey pre-shuffle — thin-keys-then-wide family: "
        "partial distinct collapses at sf0.1 (148k ~= keys), approaches "
        "input rows at sf1 (4.4M of 6M lineitem); the wide arrays ride "
        "only the 300-key broadcast side"),
    "q101_map_funcs2": ("rows-transition",
        "FlipProbe r15: same TopKeys.smallest distinct pre-shuffle as "
        "q100 (identical 4,372,417 sf1 rows)"),
    "q115_jsonpath_wildcard": ("rows-transition",
        "FlipProbe r15: same TopKeys.smallest distinct pre-shuffle as "
        "q100 (identical 4,372,417 sf1 rows)"),
    "q149_cdf_funcs2": ("rows-transition",
        "FlipProbe r15: same TopKeys.smallest distinct pre-shuffle as "
        "q100 (+2.4k rows from its extra bounded agg)"),
    "q173_zip_regexp_split": ("rows-transition",
        "FlipProbe r15: same TopKeys.smallest distinct pre-shuffle as "
        "q100 (identical 4,372,417 sf1 rows)"),
    # --- r17-opt: keys flagged because the SMALL side improved ----------
    # The r17-opt embeddings rebalance (Tables.scala: byte-sized width)
    # collapsed these brute-declared faces' sf0.1 exchanges — the
    # per-qid rank pushdown ships k-sized lists from ONE input
    # partition instead of per-partition lists from 32. The decade side
    # is BYTE-FLAT vs the pre-change record, i.e. the ratio moved by
    # denominator, not by any big-side regression; at the decade the
    # shuffle is probes x corpus rows — the declared brute posture.
    "q198_contrastive_mining": ("rows-transition",
        "r17-opt: sf1 bytes byte-flat vs SHUFFLE_sf1_r17 (7.79->7.78 "
        "MB), rows 240k ~= 10 anchors x corpus (row-linear, brute "
        "declared); sf0.1 side collapsed 24k->4k rows under the "
        "byte-sized rebalance (rank pushdown over 1 input partition)"),
    "q210_matryoshka": ("rows-transition",
        "r17-opt: sf1 bytes byte-flat vs SHUFFLE_sf1_r17 (8.53->8.49 "
        "MB), rows 220k ~= 10 probes x corpus (row-linear, brute "
        "declared); sf0.1 side collapsed 22k->2k rows under the "
        "byte-sized rebalance"),
    "q160_setdigest2": ("rows-transition",
        "FlipProbe r15: bhj=1/smj=0 both scales; groupBy(grp, h) KMV "
        "pre-agg where h ~ distinct custkey hashes — keys ~ input "
        "cardinality, rows-bound at the decade (907k); rank window then "
        "caps state at k per group"),
    # --- r16: the documents/pipeline decade (sf1 -> sf10) ---------------
    # r16 entries are scoped to the sf1 -> sf10 pair (third tuple
    # element): these keys are linear on the canonical decade and only
    # flag at the second one, so the canonical stale-check must not
    # demand their deletion.
    "q161_winnow_spans": ("rows-transition",
        "FlipProbe r16: bhj 4->5, smj 0 at both scales — no broadcast "
        "lost (AQE adds one); the winnowed-fingerprint partial agg is "
        "keys-bound at sf1 and approaches selected-fingerprint rows at "
        "sf10; bytes 13.3x within 1.1x of rows 12.1x", "sf1->sf10"),
    "q71_dedup_embedding_cosine": ("build-density",
        "Q71Probe r12+r16: fixed-nBits LSH candidate join is "
        "n^2/2^nBits by construction (16 buckets at the oracled "
        "nBits=4); bytes 59.0x within 1.5x of rows 85.3x. The knob is "
        "written on the operator: hold occupancy constant "
        "(nBits ~ log2 n - 8) for linear candidate WALL cost (sf10 "
        "977.7 -> 40.3 s at +4 bits); the byte growth itself is "
        "output-sized — the synthetic clusters make the correct answer "
        "quadratic (62,675 -> 6,250,318 pairs/decade at threshold 0.4; "
        "BENCHNOTES r16). High-recall scale path: q62 banded minhash / "
        "q176 SemDeDup cells", "sf1->sf10"),
}


def load(path):
    out, sf_dir = {}, None
    for line in open(path):
        meta = re.match(r"\[shuffle-meta\] sf_dir=(\S+)", line)
        if meta:
            sf_dir = meta.group(1)
        m = re.match(
            r"\[shuffle\] (\S+)\s+shuffle_mb=([\d.]+)\s+shuffle_rows=(\d+)",
            line)
        if m:
            out[m.group(1)] = (float(m.group(2)), int(m.group(3)))
    return out, sf_dir


def main():
    (small, small_sf), (big, big_sf) = load(sys.argv[1]), load(sys.argv[2])
    if small_sf == big_sf and small_sf is not None:
        print(f"FAIL: both snapshots at {small_sf} — this gate compares "
              f"ACROSS scales; use shuffle_diff.py for same-scale diffs")
        sys.exit(1)
    failures, flagged = [], {}
    print(f"{'query':36s} {'bytes MB':>19s} {'x':>6s} {'rows x':>7s}  verdict")
    for name in sorted(set(small) & set(big)):
        (smb, srows), (bmb, brows) = small[name], big[name]
        if bmb < MIN_BIG_MB:
            continue
        ratio = bmb / max(smb, 0.005)
        rows_ratio = brows / max(srows, 1)
        if ratio <= THRESH:
            continue
        flagged[name] = ratio
        adj = ADJUDICATIONS.get(name)
        if adj is not None and len(adj) > 2 and adj[2] == "sf1->sf10" \
                and not (big_sf or "").endswith("sf10"):
            adj = None  # scoped entry does not apply to this pair
        if adj is None:
            failures.append(f"{name}: {ratio:.1f}x bytes/decade UNADJUDICATED"
                            f" (bytes {smb:.2f}->{bmb:.2f} MB)")
            verdict = "UNADJUDICATED"
        else:
            mech = adj[0]
            if ratio > ROWS_CONSISTENCY * rows_ratio:
                failures.append(
                    f"{name}: adjudicated {mech} but bytes ratio "
                    f"{ratio:.1f}x >> rows ratio {rows_ratio:.1f}x — growth "
                    f"is WIDTH, not rows; the adjudication does not hold")
                verdict = f"{mech} INCONSISTENT"
            else:
                verdict = f"{mech} ok"
        print(f"{name:36s} {smb:8.2f} -> {bmb:8.2f} {ratio:5.1f}x "
              f"{rows_ratio:6.1f}x  {verdict}")
    # staleness: every adjudication must still be earning its keep.
    # Enforced only on the CANONICAL sf0.1 -> sf1 pair the entries were
    # written against — on other decades (sf1 -> sf10) a key can
    # legitimately drop under threshold BECAUSE the adjudicated
    # transition completed (its shuffle hit the input-rows ceiling), and
    # that is the prediction coming true, not a rotten record.
    canonical = (small_sf or "").endswith("sf0.1") and \
        (big_sf or "").endswith("sf1")
    for name, adj in sorted(ADJUDICATIONS.items()):
        mech = adj[0]
        # scoped entries (r16): only checked for freshness on their own
        # pair — a key linear on the canonical decade that flags at the
        # second one is not a rotten canonical record
        if len(adj) > 2 and adj[2] == "sf1->sf10" \
                and not (big_sf or "").endswith("sf10"):
            continue
        if name not in small or name not in big:
            if canonical:
                failures.append(f"{name}: adjudicated ({mech}) but missing "
                                f"from a snapshot — delete or update the entry")
        elif name not in flagged:
            ratio = big[name][0] / max(small[name][0], 0.005)
            if ratio < STALE_BELOW:
                msg = (f"{name}: adjudicated ({mech}) but now only "
                       f"{ratio:.1f}x on this pair")
                if canonical:
                    failures.append(
                        msg + " — stale entry, delete it (records must not rot)")
                else:
                    print(f"NOTE {msg} (non-canonical pair: transition "
                          f"likely completed — the adjudicated outcome)")
    print(f"\n{len(flagged)} flagged keys / {len(ADJUDICATIONS)} adjudications")
    if failures:
        print("FAIL:")
        for f in failures:
            print(f"  {f}")
        sys.exit(1)
    print("OK: every >12x key adjudicated, consistent, and fresh")


if __name__ == "__main__":
    main()
