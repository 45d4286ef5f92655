"""Generate synthetic documents/embeddings parquet at an arbitrary scale
factor, distribution-matched to the driver testdata (TESTDATA.md), for
LOCAL scale probes only (scripts/scale_probe.py).

The bundled /root/testdata is read-only and stops at sf0.1, so scaling
exponents need self-consistent inputs: this generator is run at BOTH the
reference SF and the target SF and queries are timed on the two
generated dirs — never mixing generated data with driver data — so the
exponent measures the engine, not a distribution shift.

Matched properties (measured on /root/testdata/sf0.1):
  documents: n = 50_000*sf rows; text = uniform draws from the same
    30-word vocab (+ the rare 'dup' token at ~0.09% of tokens); words
    per doc ~ U[10, 100]; lang weighted {en .41, zh .15, es .15,
    fr .15, de .14}; source uniform over src0..src19; n_chars =
    len(text).
  embeddings: n = 20_000*sf rows; embedding = 64 iid N(0, 0.125)
    float32; label ~ U[0, 9].

Usage: python scripts/gen_scale_data.py <sf> <out_dir> [vec_sf]
       (vec_sf scales ONLY the embeddings table — the vector-axis probe
       holds documents constant while growing the vector count)
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def gen(sf: float, out_dir: str, seed: int = 42, vec_sf: float = None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_docs = int(50_000 * sf)
    lens = rng.integers(10, 101, size=n_docs)
    texts = []
    for ln in lens:
        words = rng.integers(0, len(VOCAB), size=ln)
        toks = [VOCAB[w] for w in words]
        # ~0.09% of tokens are the rare 'dup' marker
        for j in np.flatnonzero(rng.random(ln) < 0.0009):
            toks[j] = "dup"
        texts.append(" ".join(toks))
    docs = pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array([LANGS[i] for i in rng.choice(5, size=n_docs, p=LANG_P)]),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, size=n_docs)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(docs, f"{out_dir}/documents.parquet")

    n_vec = int(20_000 * (sf if vec_sf is None else vec_sf))
    mat = rng.normal(0.0, 0.125, size=(n_vec, 64)).astype(np.float32)
    emb = pa.table({
        "vec_id": pa.array(np.arange(n_vec), pa.int64()),
        "embedding": pa.array(list(mat), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n_vec), pa.int32()),
    })
    pq.write_table(emb, f"{out_dir}/embeddings.parquet")
    print(f"wrote {n_docs} docs + {n_vec} embeddings to {out_dir}")


if __name__ == "__main__":
    gen(float(sys.argv[1]), sys.argv[2],
        vec_sf=float(sys.argv[3]) if len(sys.argv) > 3 else None)
