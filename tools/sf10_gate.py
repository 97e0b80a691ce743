#!/usr/bin/env python3
"""Standing sf10 cross-engine oracle gate (r17, VERDICT r16 item 1).

The one-off r16 spot-oracle caught a REAL cross-engine bug — q67's
float quality composite disagreed with DuckDB on 2/500,000 docs sitting
exactly on a .xxxx5 rounding boundary, invisible at sf0.01/sf0.1/sf1 —
so the third decade needs a PERMANENT correctness signal, not a
remembered ritual. This gate:

  1. runs graft.Verify over the affordable key set against
     target/testdata/sf10 (regenerate with tools/gen_sf10.py +
     tools/gen_sf10_docs.py if missing — target/testdata is gitignored),
  2. replays each key's DuckDB oracle on the same tables via check.py
     (exact semantics: row count, sorted column names, value equality),
  3. writes a per-key PASS/FAIL record (SF10_ORACLE_r{N}.txt — commit
     it like the SHUFFLE_* records), and
  4. exits non-zero on ANY mismatch.

Affordability: the key set covers every family whose BOTH faces stay
tractable at 500k docs / 500k vectors / 60M lineitem rows — aggregate
outputs, bounded rank lists, and per-document projections (≤ ~1.5M-row
compares). Excluded: the pair pipelines (shingle-band self-joins,
recursive dedup closures, corpus builds) whose DUCKDB replay is
super-linear at the decade — those keys are covered by the sf1 sweeps
plus the xscale shuffle gates instead.

Usage: python3 tools/sf10_gate.py [--record SF10_ORACLE.txt]
                                  [--skip-verify] [key ...]
"""
import os, subprocess, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10 = os.path.join(REPO, "target/testdata/sf10")
OUT = os.path.join(REPO, "target/sf10_verify")

# The affordable set (r17 widening of the 19-key r16 spot list).
KEYS = [
    # TPC-H aggregate forms over the 60M-row lineitem decade
    "q02_tpch_q1", "q05_tpch_q5", "q06_tpch_q6", "q25_having",
    "q31_conditional_agg", "q72_tpch_q7", "q73_tpch_q8", "q74_tpch_q9",
    "q76_tpch_q12", "q77_tpch_q13", "q78_tpch_q14", "q79_tpch_q15",
    "q80_tpch_q19", "q82_tpch_q22", "q184_tpch_q11", "q185_tpch_q16",
    # aggregate family (small outputs by construction)
    "q45_stat_aggs", "q46_minmax_by", "q47_count_if_bool", "q50_percentiles",
    "q51_histogram_map_agg", "q52_checksum_agg", "q85_hdr_quantile",
    "q92_bit_aggs", "q94_heavy_hitters", "q95_regression_aggs",
    "q99_kmv_theta", "q110_map_union", "q114_numeric_histogram",
    "q117_agg_misc", "q134_set_aggs", "q144_reduce_agg", "q158_trimmed_mean",
    "q160_setdigest2",
    # event family (6M events; per-event-output keys excluded — the
    # python-side compare of multi-million wide rows is the cost, not
    # the engines)
    "q53_event_tumbling", "q54_event_sessionize", "q124_funnel",
    # documents family (500k docs; the family that caught q67)
    "q66_langid", "q67_quality_score", "q68_token_count", "q69_fingerprint",
    "q93_pipeline_e2e", "q120_gopher_repetition", "q126_dataset_split",
    "q127_stratified_sample", "q137_split_drift", "q165_lm_quality",
    "q194_ccnet_buckets", "q199_corpus_report", "q205_source_leakage",
    "q206_tokenizer_fertility", "q207_quality_classifier",
    "q208_quality_agreement", "q212_classifier_bias",
    "q219_corpus_diff", "q221_classify_multi",
    # retrieval + ANN brute faces (bounded rank lists over 500k vectors)
    "q64_embedding_knn_brute", "q136_tfidf", "q140_bm25", "q175_dsir",
    "q210_matryoshka", "q215_hybrid_rrf", "q216_ann_recall",
    "q217_nn_label_agreement", "q220_hybrid_search", "q222_filtered_ann",
    "q223_hybrid_indexed_recall", "q224_bm25_index", "q225_filtered_hybrid",
]


def main():
    args = sys.argv[1:]
    record = None
    skip_verify = False
    keys = []
    i = 0
    while i < len(args):
        if args[i] == "--record":
            record = args[i + 1]; i += 2
        elif args[i] == "--skip-verify":
            skip_verify = True; i += 1
        else:
            keys.append(args[i]); i += 1
    if not keys:
        keys = KEYS

    missing = [t for t in ["lineitem", "documents", "embeddings", "events"]
               if not os.path.exists(os.path.join(SF10, f"{t}.parquet"))]
    if missing:
        print(f"[sf10_gate] MISSING sf10 tables {missing}: regenerate with "
              "tools/gen_sf10.py and tools/gen_sf10_docs.py "
              "(target/testdata is gitignored)")
        return 2

    t0 = time.time()
    if not skip_verify:
        env = dict(os.environ)
        env.setdefault("SPARK_GRAFT_CPUS", "32")
        env.setdefault("SPARK_DRIVER_MEM", "48g")
        r = subprocess.run(
            [os.path.join(REPO, "tools/run.sh"), "graft.Verify", SF10, OUT] + keys,
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        if r.returncode != 0:
            print(f"[sf10_gate] Verify exited {r.returncode}")
            return 1
    t_verify = time.time() - t0

    t1 = time.time()
    chk = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/check.py"), OUT, SF10] + keys,
        capture_output=True, text=True)
    t_check = time.time() - t1
    out = chk.stdout + chk.stderr

    lines = [l for l in out.splitlines()
             if l.startswith(("PASS", "FAIL", "WARN", "ERR", "=="))]
    n_pass = sum(1 for l in lines if l.startswith("PASS"))
    bad = [l for l in lines if l.startswith(("FAIL", "ERR"))]
    header = (f"sf10 oracle gate: {n_pass}/{len(keys)} PASS, "
              f"{len(bad)} FAIL/ERR  "
              f"(verify {t_verify:.0f}s, duckdb compare {t_check:.0f}s)")
    body = "\n".join([header, ""] + lines)
    print(body)
    if record:
        with open(record, "w") as f:
            f.write(body + "\n")
        print(f"[sf10_gate] record -> {record}")
    return 1 if (bad or n_pass != len(keys)) else 0


if __name__ == "__main__":
    sys.exit(main())
