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


FRAME_BYTES = 1024
FRAME_STRIDE = 2
FRAME_SCHEMA = "doc_id long, frame_idx long, frame_offset long, frame_len long"


def sample_frames(
    docs_with_payload: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    stride: int = FRAME_STRIDE,
) -> DataFrame:
    """Frame sampling plumbing: one input row fans out to one output row
    per sampled frame — the video-decode shape (`mapInPandas` is the
    only Spark stage whose output cardinality is decided inside the
    batch loop, which is exactly what a real demuxer needs).

    The stub "demuxer" treats the payload as fixed-size frames of
    ``frame_bytes`` and samples every ``stride``-th frame; a real one
    (pyav / ffmpeg) replaces the loop body and nothing else changes —
    the schema, the fan-out, and the payloads-never-shuffle property
    are the production contract. Frame geometry (offset/len) is emitted
    rather than frame bytes: features flow downstream, media stays in
    the scan stage.

    Returns ``(doc_id, frame_idx, frame_offset, frame_len)``.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = 0 if payload is None else len(payload)
                n_frames = (n + frame_bytes - 1) // frame_bytes
                for idx in range(0, n_frames, stride):
                    off = idx * frame_bytes
                    rows.append(
                        (doc_id, idx, off, min(frame_bytes, n - off))
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_offset", "frame_len"]
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        _sample, schema=FRAME_SCHEMA
    )


def payload_sniff(docs_with_payload: DataFrame) -> DataFrame:
    """Content-class sniffing over the raw binary column — entirely
    JVM-side (hex of the first payload byte + a CASE ladder), proving
    binary columns don't force a Python stage when the operation is
    byte-peeking rather than decoding. In production the same ladder
    holds media magic numbers (FFD8 JPEG, 8950 PNG, 52494646 RIFF...);
    on this corpus's utf-8 stand-in payloads the classes are lexical.

    One narrow map + one tiny groupBy. Returns
    ``(content_class, n_items, total_bytes, max_bytes)``.
    """
    h = F.hex(F.substring(F.col("payload"), 1, 1))
    # lower-led text splits into alphabet bands so the ladder provably
    # discriminates on this corpus (every doc starts with a lowercase
    # ascii word) — in production these arms are media magic numbers.
    content_class = (
        F.when(F.col("payload").isNull() | (F.octet_length("payload") == 0), "empty")
        .when(h == "7B", "json-like")        # '{'
        .when(h == "3C", "markup-like")      # '<'
        .when(h.between("30", "39"), "digit-led")
        .when(h.between("41", "5A"), "upper-led")
        .when(h.between("61", "66"), "lower-af")
        .when(h.between("67", "6D"), "lower-gm")
        .when(h.between("6E", "73"), "lower-ns")
        .when(h.between("74", "7A"), "lower-tz")
        .otherwise("other")
    )
    return (
        docs_with_payload.select(
            content_class.alias("content_class"),
            F.octet_length("payload").cast("long").alias("blen"),
        )
        .groupBy("content_class")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("blen").cast("long").alias("total_bytes"),
            F.max("blen").cast("long").alias("max_bytes"),
        )
    )
