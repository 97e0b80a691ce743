#!/usr/bin/env python3
"""Generate sf1-scale documents/embeddings parquet (10x sf0.1) for the
BENCH-only 1000x stress table (r10 VERDICT item 6). The driver's
testdata stops at sf0.1; this synthesizes the next decade with the SAME
distributional structure, measured from sf0.1 itself:

- documents: 50k rows; doc length uniform[10, 100] words; words drawn
  per-language from the measured sf0.1 (lang, word) frequency table
  (so langid/stopword behavior scales, not shifts); langs and sources
  at the measured mix; exact-duplicate rate as measured (~0.16%) via
  every 625th doc copying an earlier one.
- embeddings: 20k rows; 10 label clusters; unit vectors = normalized
  (cluster center + gaussian noise), matching the measured unit-norm
  and cluster structure.
- relational decade (r13 VERDICT item 1): customer/supplier/part/
  orders/lineitem/events at 10x sf0.1 rows, with the generative
  structure MEASURED from sf0.1 (all columns are independent uniforms
  there: lines-per-order is the Poisson profile of uniform orderkey
  draws, shipdate is independent of orderdate, qty-extprice corr
  0.001; categorical mixes, date windows, and value grids replicated;
  events stay inside the same 30-day window — 10x traffic, not 10x
  calendar — so window/session density scales the way a real ingest
  does). region/nation are fixed 5/25-row dimensions, copied as-is.

Deterministic (seed 421; the relational block draws from its own
seeded numpy generator so documents/embeddings stay byte-identical
across regenerations). Output: target/testdata/sf1/*.parquet —
never under /root/testdata (read-only driver data). Originally
BENCH-only; late r10 ALSO ran the full oracle here (Verify +
tools/check.py against this directory): 186/186 pass at sf1 (the full registered surface at the time of the final r10 run), so the
decade is both a throughput and a correctness point.
"""
import os
import random
import math

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "target", "testdata", "sf1")
N_DOCS, N_VECS, DIM, SEED = 50000, 20000, 64, 421

os.makedirs(OUT, exist_ok=True)
rng = random.Random(SEED)


def write(name, table):
    """Write a table, replacing any sf0.1 symlink left by earlier rounds
    (writing THROUGH the link would hit the read-only driver data)."""
    path = os.path.join(OUT, name)
    if os.path.islink(path):
        os.remove(path)
    pq.write_table(table, path)

# measured generative structure
langrows = duckdb.sql(
    f"SELECT lang, count(*) FROM '{SRC}/documents.parquet' GROUP BY 1 ORDER BY 1").fetchall()
langs = [l for l, _ in langrows]
langw = [c for _, c in langrows]
wordrows = duckdb.sql(
    "SELECT lang, w, count(*) FROM (SELECT lang, unnest(string_split(text,' ')) w "
    f"FROM '{SRC}/documents.parquet') GROUP BY 1,2 ORDER BY 1,2").fetchall()
vocab = {}
for lang, w, c in wordrows:
    vocab.setdefault(lang, ([], []))
    vocab[lang][0].append(w)
    vocab[lang][1].append(c)

doc_ids, texts, doc_langs, sources, n_chars = [], [], [], [], []
for i in range(N_DOCS):
    if i % 625 == 624 and i > 0:  # measured exact-dup rate ~8/5000
        j = rng.randrange(len(texts))
        t, lg = texts[j], doc_langs[j]
    else:
        lg = rng.choices(langs, weights=langw)[0]
        words, weights = vocab[lg]
        t = " ".join(rng.choices(words, weights=weights,
                                 k=rng.randint(10, 100)))
    doc_ids.append(i)
    texts.append(t)
    doc_langs.append(lg)
    sources.append(f"src{rng.randrange(20)}")
    n_chars.append(len(t))

write("documents.parquet", pa.table({
    "doc_id": pa.array(doc_ids, pa.int64()),
    "text": pa.array(texts, pa.string()),
    "lang": pa.array(doc_langs, pa.string()),
    "source": pa.array(sources, pa.string()),
    "n_chars": pa.array(n_chars, pa.int64()),
}))

centers = []
for _ in range(10):
    v = [rng.gauss(0, 1) for _ in range(DIM)]
    n = math.sqrt(sum(x * x for x in v))
    centers.append([x / n for x in v])
vec_ids, embs, labels = [], [], []
for i in range(N_VECS):
    lab = rng.randrange(10)
    v = [c + rng.gauss(0, 0.6) for c in centers[lab]]
    n = math.sqrt(sum(x * x for x in v))
    vec_ids.append(i)
    embs.append([float(x / n) for x in v])
    labels.append(lab)

write("embeddings.parquet", pa.table({
    "vec_id": pa.array(vec_ids, pa.int64()),
    "embedding": pa.array(embs, pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32()),
}))

# Anisotropic stress set (r11 VERDICT item 6): same size/cluster
# structure, but the eigenspectrum decays geometrically along the
# coordinate axes (w_d = 0.93^d as the per-dim SIGMA: ~95x sigma
# ratio, ~9000x variance ratio end to end) —
# the PQ worst case, where consecutive-dim subvectors carry wildly
# unequal variance and a pre-subvec rotation (OPQ) would be the fix
# if recall collapses. Separate seed so this block can't perturb the
# main embeddings on regeneration.
arng = random.Random(SEED + 1)
w = [0.93 ** d for d in range(DIM)]
acenters = []
for _ in range(10):
    v = [arng.gauss(0, wd) for wd in w]
    n = math.sqrt(sum(x * x for x in v))
    acenters.append([x / n for x in v])
avec_ids, aembs, alabels = [], [], []
for i in range(N_VECS):
    lab = arng.randrange(10)
    v = [c + arng.gauss(0, 0.6 * wd) for c, wd in zip(acenters[lab], w)]
    n = math.sqrt(sum(x * x for x in v))
    avec_ids.append(i)
    aembs.append([float(x / n) for x in v])
    alabels.append(lab)

write("embeddings_aniso.parquet", pa.table({
    "vec_id": pa.array(avec_ids, pa.int64()),
    "embedding": pa.array(aembs, pa.list_(pa.float32())),
    "label": pa.array(alabels, pa.int32()),
}))

# --- relational decade (r13 VERDICT item 1) ---------------------------
# 10x sf0.1 rows per fact/dim table. Structure measured from sf0.1
# (2026-08-15 session): every column is an independent uniform there —
# lines-per-order is exactly the Poisson(4) profile of 6M uniform
# orderkey draws over 1.5M orders, l_shipdate is independent of
# o_orderdate (min diff -2399 days), corr(l_quantity,
# l_extendedprice) = 0.001, p_retailprice = 900 + (p_partkey%1000)/10
# exactly. Vectorized numpy with its own seed; key spaces scale 10x so
# join fan-outs (orders per customer ~10, lineitems per part ~30)
# match sf0.1, not densify.
nrng = np.random.default_rng(SEED + 2)
N_CUST, N_SUPP, N_PART = 150000, 10000, 200000
N_ORD, N_LINE, N_EVT, N_USERS = 1500000, 6000000, 1000000, 15000
DAY_US = 86400000000


def money(n, lo, hi):
    return np.round(nrng.uniform(lo, hi, n), 2)


def days(n, lo, hi):
    """Uniform midnight timestamps over [lo, hi] inclusive."""
    d = (np.datetime64(hi) - np.datetime64(lo)).astype("timedelta64[D]")
    return (np.datetime64(lo) + nrng.integers(0, d.astype(int) + 1, n)
            .astype("timedelta64[D]")).astype("datetime64[us]")


def cat(n, values):
    # measured mixes are uniform over the category set in every table
    return pa.array(np.array(values)[nrng.integers(0, len(values), n)])


# fixed dimensions: 5/25 rows, scale-independent — copy content
for t in ["region", "nation"]:
    write(f"{t}.parquet", pq.read_table(f"{SRC}/{t}.parquet"))

write("customer.parquet", pa.table({
    "c_custkey": pa.array(np.arange(N_CUST), pa.int64()),
    "c_name": pa.array([f"Customer#{i:09d}" for i in range(N_CUST)]),
    "c_nationkey": pa.array(nrng.integers(0, 25, N_CUST), pa.int32()),
    "c_acctbal": pa.array(money(N_CUST, -1000, 10000)),
    "c_mktsegment": cat(N_CUST, ["AUTOMOBILE", "BUILDING", "FURNITURE",
                                 "HOUSEHOLD", "MACHINERY"]),
}))

write("supplier.parquet", pa.table({
    "s_suppkey": pa.array(np.arange(N_SUPP), pa.int64()),
    "s_name": pa.array([f"Supplier#{i:09d}" for i in range(N_SUPP)]),
    "s_nationkey": pa.array(nrng.integers(0, 25, N_SUPP), pa.int32()),
    "s_acctbal": pa.array(money(N_SUPP, -1000, 10000)),
}))

adjs = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
nouns = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
pk = np.arange(N_PART)
write("part.parquet", pa.table({
    "p_partkey": pa.array(pk, pa.int64()),
    "p_name": pa.array([f"{adjs[a]} {nouns[b]}" for a, b in
                        zip(nrng.integers(0, 8, N_PART),
                            nrng.integers(0, 8, N_PART))]),
    "p_brand": pa.array([f"Brand#{b}" for b in nrng.integers(1, 26, N_PART)]),
    "p_type": cat(N_PART, ["ECONOMY", "LARGE", "MEDIUM", "PROMO",
                           "SMALL", "STANDARD"]),
    "p_size": pa.array(nrng.integers(1, 51, N_PART), pa.int32()),
    "p_retailprice": pa.array(900.0 + (pk % 1000) / 10.0),
}))

write("orders.parquet", pa.table({
    "o_orderkey": pa.array(np.arange(N_ORD), pa.int64()),
    "o_custkey": pa.array(nrng.integers(0, N_CUST, N_ORD), pa.int64()),
    "o_orderstatus": cat(N_ORD, ["F", "O", "P"]),
    "o_totalprice": pa.array(money(N_ORD, 1000, 500000)),
    "o_orderdate": pa.array(days(N_ORD, "1995-01-01", "2001-08-01")),
    "o_orderpriority": cat(N_ORD, ["1-URGENT", "2-HIGH", "3-MEDIUM",
                                   "4-NOT SPECIFIED", "5-LOW"]),
}))

write("lineitem.parquet", pa.table({
    "l_orderkey": pa.array(nrng.integers(0, N_ORD, N_LINE), pa.int64()),
    "l_partkey": pa.array(nrng.integers(0, N_PART, N_LINE), pa.int64()),
    "l_suppkey": pa.array(nrng.integers(0, N_SUPP, N_LINE), pa.int64()),
    "l_linenumber": pa.array(nrng.integers(1, 8, N_LINE), pa.int32()),
    "l_quantity": pa.array(nrng.integers(1, 51, N_LINE).astype(np.float64)),
    "l_extendedprice": pa.array(money(N_LINE, 900, 105000)),
    "l_discount": pa.array(nrng.integers(0, 11, N_LINE) / 100.0),
    "l_tax": pa.array(nrng.integers(0, 9, N_LINE) / 100.0),
    "l_returnflag": cat(N_LINE, ["A", "N", "R"]),
    "l_linestatus": cat(N_LINE, ["F", "O"]),
    "l_shipdate": pa.array(days(N_LINE, "1995-01-02", "2001-11-04")),
}))

# events: 10x traffic over the SAME 30-day window (uniform arrivals ==
# the measured Poisson process at 10x rate), ids assigned in ts order
# as measured; users scale with traffic so per-user session density
# holds; value is the measured Exponential(mean 50) rounded to cents
ts_lo = np.datetime64("2024-01-01T00:00:00").astype("datetime64[us]").astype(np.int64)
ts = np.sort(nrng.integers(ts_lo, ts_lo + 30 * DAY_US, N_EVT))
write("events.parquet", pa.table({
    "event_id": pa.array(np.arange(N_EVT), pa.int64()),
    "ts": pa.array(ts.astype("datetime64[us]")),
    "user_id": pa.array(nrng.integers(0, N_USERS, N_EVT), pa.int64()),
    "event_type": cat(N_EVT, ["click", "error", "purchase", "signup", "view"]),
    "value": pa.array(np.round(nrng.exponential(50.0, N_EVT), 2)),
    "props": pa.array([f'{{"k": {k}}}' for k in nrng.integers(0, 100, N_EVT)]),
}))

print(f"wrote {OUT}: documents={N_DOCS} embeddings={N_VECS} "
      f"embeddings_aniso={N_VECS} customer={N_CUST} supplier={N_SUPP} "
      f"part={N_PART} orders={N_ORD} lineitem={N_LINE} events={N_EVT}")
