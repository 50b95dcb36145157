#!/usr/bin/env python
"""Deterministic probe-only `documents` fixture, one decade above sf0.1.

The pair-join dedup family (allpairs prefix join, substring dedup/trim,
source overlap) is the one place in the repo whose cost is genuinely
data-dependent: candidate growth depends on the near-duplicate and
shingle-frequency structure, not just row count. The driver fixtures
stop at sf0.1 (5,000 docs), so this generator synthesizes a ~sf1
`documents` table (50,000 docs, same schema) and lets
tools/scale_probe.py measure one more ×10 step for exactly that family
(r12 VERDICT #6).

WHY THE VOCABULARY GROWS (the design decision that matters): the
driver fixture has a CLOSED 31-word vocabulary, so its ~27k distinct
3-gram shingles SATURATE — ×10 more docs multiplies every shingle's
corpus frequency by ×10 and any shingle-keyed pair join grows ×100 BY
CONSTRUCTION (measured: sum(freq²) 2.8M at sf0.1 → 288M for a closed-
vocab ×10). That would measure vocabulary saturation, not plan
scaling. Real web text is the opposite regime: shingle vocabulary
grows with the corpus (Heaps' law) and rare prefixes stay rare — the
property AllPairs/MinHash/ExactSubstr are designed around. So the
decade fixture extends the vocabulary (the 31 real words keep the top
frequency ranks; 186 synthetic words fill the tail under a zipf-0.7
curve), calibrated so the pair-join work drivers scale ≈ linearly
from the sf0.1 measurements:
  - doc-shingle rows:   260k → ~2.6M   (×10, by row count)
  - sum(shingle freq²): 2.8M → ~23M    (×8, the join fan-out proxy;
                        closed vocab would be ×100)
  - near-dup pairs:     ~256 → ~2.5k   (×10: 2-doc clusters with
                        DISTINCT real base docs, 1-3 token edits —
                        pairs-per-doc matches the driver fixture's
                        ~5 per 100 docs)
  - duplicated 30-char windows: near-dup + boilerplate + exact-dup
                        docs land the dup-window fraction near the
                        driver fixture's ~9-15%.

Construction is seeded (no wall-clock / global-random state);
regeneration is bit-identical. Output cached at
.probe_cache/sf1syn/documents.parquet (gitignored).

NOT for correctness gates: oracle comparisons stay on the read-only
driver fixtures. This table exists only to measure growth ratios.
"""

from __future__ import annotations

import random
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
REAL_SF01 = Path("/root/testdata/sf0.1/documents.parquet")
OUT_DIR = REPO / ".probe_cache" / "sf1syn"
N_DOCS = 50_000
SEED = 1337
VOCAB_SIZE = 217  # calibrated: sum(freq²) ≈ ×8 of sf0.1 at ×10 rows
ZIPF_S = 0.7

LANGS = ["en", "en", "en", "en", "de", "fr", "zh", "es"]


def _load_real() -> tuple[list[str], list[int], list[list[str]]]:
    tbl = pq.read_table(REAL_SF01, columns=["text"])
    docs = [t.split() for t in tbl.column("text").to_pylist()]
    freq: dict[str, int] = {}
    for toks in docs:
        for t in toks:
            freq[t] = freq.get(t, 0) + 1
    # real words ranked by corpus frequency (ties by word — determinism)
    ranked = [w for w, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))]
    lengths = sorted(len(t) for t in docs)
    return ranked, lengths, docs


def generate(out_dir: Path = OUT_DIR, n_docs: int = N_DOCS) -> Path:
    out = out_dir / "documents.parquet"
    if out.exists():
        try:
            if pq.read_metadata(out).num_rows == n_docs:
                return out_dir
        except Exception:
            pass
    real_vocab, lengths, real_docs = _load_real()
    vocab = real_vocab + [f"qv{i:03d}" for i in range(VOCAB_SIZE - len(real_vocab))]
    weights = [1.0 / (r + 1) ** ZIPF_S for r in range(len(vocab))]
    rng = random.Random(SEED)
    boilers = [rng.choices(vocab, weights=weights, k=20) for _ in range(10)]
    bases = list(real_docs)
    rng.shuffle(bases)  # pop() gives each near-dup cluster a DISTINCT base

    texts: list[str] = []

    def fresh() -> list[str]:
        n = lengths[rng.randrange(len(lengths))]
        return rng.choices(vocab, weights=weights, k=n)

    i = 0
    while i < n_docs:
        r = rng.random()
        if r < 0.10 and n_docs - i >= 2 and bases:
            # near-dup cluster: TWO lightly-mutated copies of one base
            base = bases.pop()
            for _ in range(2):
                toks = list(base)
                for _ in range(rng.randint(1, 3)):
                    toks[rng.randrange(len(toks))] = vocab[rng.randrange(len(vocab))]
                texts.append(" ".join(toks))
                i += 1
        elif r < 0.16:
            # boilerplate carrier: a shared 20-token run inside fresh text
            toks = fresh()
            b = boilers[rng.randrange(len(boilers))]
            pos = rng.randrange(max(1, len(toks) - 1))
            texts.append(" ".join(toks[:pos] + b + toks[pos:]))
            i += 1
        elif r < 0.162 and texts:
            texts.append(texts[rng.randrange(len(texts))])  # exact dup
            i += 1
        else:
            texts.append(" ".join(fresh()))
            i += 1

    rng2 = random.Random(SEED + 1)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(
                [LANGS[rng2.randrange(len(LANGS))] for _ in texts], type=pa.string()
            ),
            "source": pa.array(
                [f"src{rng2.randrange(20)}" for _ in texts], type=pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    # multiple row groups so the scan parallelizes like a real multi-file
    # dataset (the driver fixtures are one row group per file — a known
    # trap the heavy plans repartition around anyway)
    pq.write_table(tbl, out, row_group_size=8192)
    return out_dir


if __name__ == "__main__":
    d = generate()
    print(d)
