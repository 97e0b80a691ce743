#!/usr/bin/env python3
"""Generate the ADVERSARIAL-SKEW sf0.1 variant (r14 VERDICT item 3).

Every driver table is measured-uniform, so the skew machinery
(Skew.saltedJoin, Components.saltedHotKeyJoin, AQE skew splits, the
quota hot-domain prefilter, the df caps in minhash banding) was
exercised only in specs. This synthesizes target/testdata/sf0.1skew —
same schemas and row counts as sf0.1, but with the adversaries the
100 TB design claims to survive:

- documents.source: Zipf(1) over the 20 sources — src0 carries ~28%,
  the top 3 ~50% (the hot-domain adversary for q145's quota prefilter
  and q204/q205's per-source aggregation).
- documents.lang: Zipf(1) over the 5 languages (en ~44%).
- BOILERPLATE STAR: 10% of docs (500) are one ~60-word template with a
  single position-varying word substitution — a 500-member near-dup
  cluster spanning every source. Minhash bands collapse these into the
  same buckets (the df-cap + star-graph closure adversary that
  Components.saltedHotKeyJoin and the pointer-jumping rounds exist
  for); quality/langid stay well-defined (template drawn from the
  measured en vocabulary).
- All other text: per-language word draws from the MEASURED sf0.1
  vocabulary (langid/stopword behavior holds), lengths uniform[10,100].
- Every other table (relational, embeddings) symlinks the sf0.1
  original — the skew surface is the document corpus; symlinks keep
  the full 214-query Verify sweep runnable against this directory.

The DuckDB oracles replay the same SQL on the same parquet, so the
sweep is a REAL correctness gate on adversarial data, not a smoke
test. Deterministic (seed 427 at sf0.1, 428 at sf1). Run:

    python3 tools/gen_skew.py          # -> target/testdata/sf0.1skew
    python3 tools/gen_skew.py sf1      # -> target/testdata/sf1skew (r16:
                                       #    skew at the DECADE — 50k docs,
                                       #    a 5,000-member star; closure
                                       #    rounds grow with component
                                       #    size, so skew compounds with
                                       #    scale; needs gen_sf1.py run
                                       #    first for the symlink targets)
    tools/run.sh graft.Verify target/testdata/sf0.1skew /tmp/vskew
    python3 tools/check.py /tmp/vskew target/testdata/sf0.1skew
"""
import os
import random
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SCALE = sys.argv[1] if len(sys.argv) > 1 else "sf0.1"
TARGET = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "target", "testdata")
# vocabulary is always MEASURED from the driver's sf0.1 (the canonical
# measured structure — the gen_sf1 discipline); SRC only feeds symlinks
VOCAB_SRC = "/root/testdata/sf0.1"
if SCALE == "sf0.1":
    SRC, N_DOCS, SEED = VOCAB_SRC, 5000, 427
elif SCALE == "sf1":
    SRC, N_DOCS, SEED = os.path.join(TARGET, "sf1"), 50000, 428
else:
    sys.exit(f"unknown scale {SCALE!r}: sf0.1 | sf1")
OUT = os.path.join(TARGET, f"{SCALE}skew")
N_SOURCES = 20

os.makedirs(OUT, exist_ok=True)
rng = random.Random(SEED)

# measured per-language vocabulary (the gen_sf1 discipline)
langrows = duckdb.sql(
    f"SELECT lang, count(*) FROM '{VOCAB_SRC}/documents.parquet' GROUP BY 1 ORDER BY 1").fetchall()
langs = [l for l, _ in langrows]
wordrows = duckdb.sql(
    "SELECT lang, w, count(*) FROM (SELECT lang, unnest(string_split(text,' ')) w "
    f"FROM '{VOCAB_SRC}/documents.parquet') GROUP BY 1,2 ORDER BY 1,2").fetchall()
vocab = {}
for lang, w, c in wordrows:
    vocab.setdefault(lang, ([], []))
    vocab[lang][0].append(w)
    vocab[lang][1].append(c)

# Zipf weights: w_r = 1/(r+1)
lang_w = [1.0 / (r + 1) for r in range(len(langs))]
src_w = [1.0 / (r + 1) for r in range(N_SOURCES)]

# the boilerplate template: 60 en words, drawn once
en_words, en_weights = vocab["en"]
template = rng.choices(en_words, weights=en_weights, k=60)

doc_ids, texts, doc_langs, sources, n_chars = [], [], [], [], []
for i in range(N_DOCS):
    src = f"src{rng.choices(range(N_SOURCES), weights=src_w)[0]}"
    if i % 10 == 0:
        # star member: template with ONE word substituted at a varying
        # position — near-dup (not exact), so the minhash band path is
        # what collapses them, not the trivial exact-hash dedup
        t = list(template)
        t[(i // 10) % 60] = rng.choices(en_words, weights=en_weights)[0]
        t, lg = " ".join(t), "en"
    else:
        lg = langs[rng.choices(range(len(langs)), weights=lang_w)[0]]
        words, weights = vocab[lg]
        t = " ".join(rng.choices(words, weights=weights,
                                 k=rng.randint(10, 100)))
    doc_ids.append(i)
    texts.append(t)
    doc_langs.append(lg)
    sources.append(src)
    n_chars.append(len(t))

path = os.path.join(OUT, "documents.parquet")
if os.path.islink(path):
    os.remove(path)
pq.write_table(pa.table({
    "doc_id": pa.array(doc_ids, pa.int64()),
    "text": pa.array(texts, pa.string()),
    "lang": pa.array(doc_langs, pa.string()),
    "source": pa.array(sources, pa.string()),
    "n_chars": pa.array(n_chars, pa.int64()),
}), path)

# every other table: the uniform sf0.1 original
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]:
    link = os.path.join(OUT, f"{t}.parquet")
    if os.path.islink(link) or os.path.exists(link):
        os.remove(link)
    os.symlink(f"{SRC}/{t}.parquet", link)

from collections import Counter
c = Counter(sources)
print(f"wrote {OUT}: docs={N_DOCS} star={N_DOCS // 10} "
      f"top_sources={c.most_common(3)} langs={Counter(doc_langs).most_common()}")
