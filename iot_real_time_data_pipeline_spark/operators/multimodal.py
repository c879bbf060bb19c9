"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with
a metadata struct; per-item decode / feature-extraction runs as an
Arrow-batched ``mapInPandas`` stage so payload bytes never round-trip
through Python row-by-row. The actual codec work is STUBBED (no
image/audio libraries in this environment) behind
``decode_stub`` — a deterministic fake that derives "features" from the
raw bytes — but the Spark-side plumbing (schema, batch iteration,
partition behavior, output contract) is the real production shape:
swap ``decode_stub`` for PIL/libsndfile and nothing else changes.

Scale notes: mapInPandas streams Arrow batches per partition — no
collect, no shuffle; partition sizing should target batches of
10-100 MB of payload. Feature outputs are tiny relative to payloads, so
the downstream shuffle (if any) moves features, not media.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, byte_len long, first_byte int, n_frames long, mime string"
)


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column + metadata struct.

    Here the payload is the utf-8 encoding of the text (a deterministic
    stand-in for real media bytes); in production this is the raw media
    column from the lakehouse.
    """
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col("payload")).alias("byte_len"),
        ),
    )


EMPTY_SENTINEL = {
    "byte_len": 0,
    "first_byte": -1,
    "n_frames": 0,
    "mime": "application/x-empty",
}


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decoder.

    Replace with a real codec (PIL.Image.open, soundfile.read, ...) in
    production. Empty/missing payloads yield a deterministic sentinel
    row instead of raising, so one empty document can't fail a whole
    corpus scan (a real decoder would dead-letter these; the sentinel
    keeps the stub total and the mime column makes them filterable).
    """
    if payload is None or len(payload) == 0:
        return dict(EMPTY_SENTINEL)
    return {
        "byte_len": len(payload),
        "first_byte": payload[0],
        # fake "frame sampling": one frame per KiB
        "n_frames": len(payload) // 1024 + 1,
        "mime": "application/octet-stream",
    }


def extract_features(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[["doc_id", "byte_len", "first_byte", "n_frames", "mime"]]

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        _extract, schema=FEATURE_SCHEMA
    )
