"""Multimodal (binary) column operators (SURVEY.md §2.10).

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct. The decode/feature-extract step runs as an Arrow-batched
``mapInPandas`` — the real Spark-side plumbing (schema, batching, partition
preservation) with the actual codec stubbed: this container has no
image/audio libraries, so ``decode_stub`` derives deterministic fake
features from the raw bytes (documented, unit- and oracle-tested). Swap
``decode_stub`` for a real decoder (PIL/librosa/av) in production — the
operator contract, batch shape, and plan are unchanged.

    ["binarize", rel, {"col": "text", "as": "payload"}]
        utf-8 encode a string column into a binary payload column
        (stand-in for reading real media bytes).
    ["decode-features", rel, {"col": "payload", "id": "doc_id"}]
        mapInPandas feature extraction -> (id, n_bytes, header_hex,
        fake_w, fake_h).

Scale posture: mapInPandas is narrow (no shuffle), Arrow-batched, and
prunes to exactly (id, payload) before the Python stage so only the bytes
actually decoded cross the JVM<->Python boundary. For 100 TB media, bump
``spark.sql.execution.arrow.maxRecordsPerBatch`` down so a batch of large
payloads fits executor memory.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import functions as F

from ..eval import Ctx, defop
from ..model import KStreamRel, Rel


def _opts(rest) -> dict:
    o = {}
    for r in rest:
        if isinstance(r, dict):
            o.update(r)
    return o


@defop("binarize")
def op_binarize(ctx: Ctx, rel: Rel, *rest) -> Rel:
    opts = _opts(rest)
    col = opts.get("col", "text")
    out = opts.get("as", "payload")
    return rel.with_df(rel.df.withColumn(out, F.encode(F.col(col), "UTF-8")))


def decode_stub(payload: bytes) -> tuple[int, str, int, int]:
    """Deterministic fake decoder: (n_bytes, first-4-bytes hex, fake
    width, fake height). Replace with a real media decoder in production;
    raise NotImplementedError paths are intentionally absent because the
    stub must stay runnable in tests."""
    n = len(payload)
    return n, payload[:4].hex(), n % 640, (n * 7) % 480


@defop("decode-features")
def op_decode_features(ctx: Ctx, rel: Rel, *rest) -> KStreamRel:
    """Arrow-batched feature extraction over a binary column."""
    opts = _opts(rest)
    col = opts.get("col", "payload")
    idc = opts.get("id", "doc_id")
    pruned = rel.df.select(idc, col)
    schema = (
        f"{idc} {pruned.schema[idc].dataType.simpleString()}, "
        "n_bytes bigint, header_hex string, fake_w bigint, fake_h bigint"
    )

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [decode_stub(p) for p in pdf[col]]
            out = pd.DataFrame(feats, columns=["n_bytes", "header_hex", "fake_w", "fake_h"])
            out.insert(0, idc, pdf[idc].values)
            yield out

    return KStreamRel(pruned.mapInPandas(extract, schema), key_cols=(idc,))
