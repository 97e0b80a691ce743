#!/usr/bin/env python3
"""Generate the sf10 DOCUMENTS corpus (500k docs = 10x gen_sf1.py) —
the LLM-pipeline family's third decade (r15 VERDICT item 1: dedup/
winnow/pack/mix/BPE scale claims rested on sf0.1 -> sf1 alone, one
decade, while q203 proved the NEXT decade is where silent plan flips
live).

Same measured generative structure as gen_sf1.py's documents block
(doc length uniform[10, 100] words; per-language word draws from the
measured sf0.1 (lang, word) frequency table; langs and sources at the
measured mix; exact-duplicate rate ~0.16% via every 625th doc copying
an earlier one), vectorized with numpy for the 27M word draws. A clean
10x decade (500k, not the ~1.2M a byte-target would give) so
bytes-per-decade ratios in xscale_gate.py stay interpretable.

Deterministic: numpy generator seeded 4243 — its OWN stream, so
regenerating documents never perturbs gen_sf10.py's seed-424 relational
draws (the tables stay byte-identical) and vice versa. Output:
target/testdata/sf10/documents.parquet — never under /root/testdata.
"""
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "target", "testdata", "sf10")
N_DOCS, SEED = 500000, 4243

os.makedirs(OUT, exist_ok=True)
rng = np.random.default_rng(SEED)

# measured generative structure (the gen_sf1 measurement, verbatim)
langrows = duckdb.sql(
    f"SELECT lang, count(*) FROM '{SRC}/documents.parquet' "
    "GROUP BY 1 ORDER BY 1").fetchall()
langs = [l for l, _ in langrows]
langp = np.array([c for _, c in langrows], dtype=float)
langp /= langp.sum()
wordrows = duckdb.sql(
    "SELECT lang, w, count(*) FROM (SELECT lang, unnest(string_split(text,' ')) w "
    f"FROM '{SRC}/documents.parquet') GROUP BY 1,2 ORDER BY 1,2").fetchall()
vocab = {}
for lang, w, c in wordrows:
    vocab.setdefault(lang, ([], []))
    vocab[lang][0].append(w)
    vocab[lang][1].append(float(c))

doc_lang_idx = rng.choice(len(langs), size=N_DOCS, p=langp)
doc_len = rng.integers(10, 101, N_DOCS)
sources = [f"src{s}" for s in rng.integers(0, 20, N_DOCS)]

# per-language bulk word draws: one rng.choice per language covers every
# word of every doc in that language, then per-doc slices join
texts = [None] * N_DOCS
for li, lang in enumerate(langs):
    docs_here = np.flatnonzero(doc_lang_idx == li)
    if docs_here.size == 0:
        continue
    words = np.array(vocab[lang][0])
    p = np.array(vocab[lang][1])
    p /= p.sum()
    lens = doc_len[docs_here]
    draws = words[rng.choice(len(words), size=int(lens.sum()), p=p)]
    offs = np.concatenate(([0], np.cumsum(lens)))
    for k, di in enumerate(docs_here):
        texts[di] = " ".join(draws[offs[k]:offs[k + 1]])

# exact-duplicate rate as measured: every 625th doc copies an earlier one
doc_langs = [langs[i] for i in doc_lang_idx]
for i in range(624, N_DOCS, 625):
    j = int(rng.integers(0, i))
    texts[i] = texts[j]
    doc_langs[i] = doc_langs[j]

path = os.path.join(OUT, "documents.parquet")
if os.path.islink(path):
    os.remove(path)
pq.write_table(pa.table({
    "doc_id": pa.array(np.arange(N_DOCS), pa.int64()),
    "text": pa.array(texts, pa.string()),
    "lang": pa.array(doc_langs, pa.string()),
    "source": pa.array(sources, pa.string()),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
}), path)
print(f"wrote {path}: documents={N_DOCS}")
