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

Deterministic (seed 421). Output: target/testdata/sf1/*.parquet —
never under /root/testdata (read-only driver data). Originally
BENCH-only; late r10 ALSO ran the full oracle here (Verify +
tools/check.py against this directory): 186/186 pass at sf1 (the full registered surface at the time of the final r10 run), so the
decade is both a throughput and a correctness point.
"""
import os
import random
import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "target", "testdata", "sf1")
N_DOCS, N_VECS, DIM, SEED = 50000, 20000, 64, 421

os.makedirs(OUT, exist_ok=True)
rng = random.Random(SEED)

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

pq.write_table(pa.table({
    "doc_id": pa.array(doc_ids, pa.int64()),
    "text": pa.array(texts, pa.string()),
    "lang": pa.array(doc_langs, pa.string()),
    "source": pa.array(sources, pa.string()),
    "n_chars": pa.array(n_chars, pa.int64()),
}), os.path.join(OUT, "documents.parquet"))

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

pq.write_table(pa.table({
    "vec_id": pa.array(vec_ids, pa.int64()),
    "embedding": pa.array(embs, pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32()),
}), os.path.join(OUT, "embeddings.parquet"))

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

pq.write_table(pa.table({
    "vec_id": pa.array(avec_ids, pa.int64()),
    "embedding": pa.array(aembs, pa.list_(pa.float32())),
    "label": pa.array(alabels, pa.int32()),
}), os.path.join(OUT, "embeddings_aniso.parquet"))

print(f"wrote {OUT}: documents={N_DOCS} embeddings={N_VECS} embeddings_aniso={N_VECS}")
