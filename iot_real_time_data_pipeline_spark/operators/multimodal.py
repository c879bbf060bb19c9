"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with
a metadata struct; per-item decode / feature-extraction runs as an
Arrow-batched ``mapInPandas`` stage so payload bytes never round-trip
through Python row-by-row. IMAGE codec work is STUBBED (no PIL/cv2 in
this environment) behind ``decode_stub`` — a deterministic fake — but
the AUDIO path is a REAL codec: ``wav_features`` parses genuine
RIFF/WAVE containers with the stdlib ``wave`` reader and is
oracle-checked bit-exactly (see ``_sql_wav_features``), demonstrating
the actual codec slot; swap ``decode_stub`` for PIL and the image path
follows the same shape.

Scale notes: mapInPandas streams Arrow batches per partition — no
collect, no shuffle; partition sizing should target batches of
10-100 MB of payload. Feature outputs are tiny relative to payloads, so
the downstream shuffle (if any) moves features, not media.

Stage fusion (round 13): the declared queries compose fixture synth →
(transform) → decode, which as separate ``mapInPandas`` calls chains
2-3 Python eval nodes in one stage. Each node runs its own Python
worker per task (3 nodes x 32 tasks = 96 concurrent workers on a cold
run — measured 3-9 s of pure spawn) and the PAYLOAD BYTES cross the
JVM↔Arrow↔Python boundary once per node boundary (guide §4.1: you
cannot remove the boundary's cost, but you control how often data
crosses it). The ``*_from_ids`` entry points fuse the whole chain into
ONE ``mapInPandas`` — same per-row functions applied per batch, so the
output rows are bit-identical (every transform is row-wise; batch
boundaries don't enter the arithmetic) — and the payload bytes never
leave the Python worker between synth, transform, and decode. In
production (payloads read from the lake, not synthesized) the same
fusion applies to transform→decode chains: compose the ``_*_pdf``
batch functions instead of chaining mapInPandas calls.
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


# ---------------------------------------------------------------------------
# REAL codec path: RIFF/PCM WAV via the stdlib — no stub.
# ---------------------------------------------------------------------------

WAV_SAMPLE_RATE = 8000
WAV_BASE_SAMPLES = 160
WAV_SAMPLES_MOD = 64


def synth_wav_bytes(item_id: int) -> bytes:
    """A genuine RIFF/WAVE container (stdlib ``wave`` writer): mono
    16-bit PCM at 8 kHz, ``160 + id mod 64`` samples with
    ``s[i] = ((id*31 + i*17) mod 2048) - 1024`` — a closed form BOTH
    engines can reason about: Spark decodes the actual bytes, the
    DuckDB oracle recomputes the features from the formula, and the
    hash match proves the decode is bit-exact."""
    import io
    import struct
    import wave

    n = WAV_BASE_SAMPLES + item_id % WAV_SAMPLES_MOD
    samples = [
        ((item_id * 31 + i * 17) % 2048) - 1024 for i in range(n)
    ]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(WAV_SAMPLE_RATE)
        w.writeframes(struct.pack(f"<{n}h", *samples))
    return buf.getvalue()


def _synth_wav_pdf(pdf: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": pdf[id_col],
            "wav": [synth_wav_bytes(int(i)) for i in pdf[id_col]],
        }
    )


def with_wav_payload(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a real WAV binary column (Arrow-batched synthesis — the
    fixture half; production reads media bytes from the lake)."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _synth_wav_pdf(pdf, id_col)

    return docs.select(id_col).mapInPandas(
        _synth, schema="doc_id long, wav binary"
    )


def _fused_map(
    docs: DataFrame, id_col: str, stages: list, schema: str
) -> DataFrame:
    """ONE mapInPandas applying a chain of per-batch transforms (module
    docstring, "Stage fusion"): payload bytes stay inside the Python
    worker across the chain, and one Python eval node spawns one worker
    pool instead of one per chained stage. Row-wise stages make the
    result independent of batch boundaries, hence bit-identical to the
    unfused composition."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for stage in stages:
                pdf = stage(pdf)
            yield pdf

    return docs.select(id_col).mapInPandas(_run, schema=schema)


WAV_FEATURE_SCHEMA = (
    "doc_id long, n_samples long, sample_rate long, sum_sq long, "
    "peak_abs long, n_zero_cross long"
)


def wav_features(docs_with_wav: DataFrame) -> DataFrame:
    """REAL audio decode + feature extraction, no media library needed:
    the stdlib ``wave`` reader parses the RIFF container (fmt chunk →
    channel count / sample width / rate; data chunk → PCM frames) and
    the features are integer functions of the decoded int16 samples —
    frame count and rate FROM THE PARSED HEADER, energy (Σ s²), peak
    |s|, and sign-change count. If the decoder misread the container
    by one byte, every feature would shift and the oracle hash would
    catch it.

    Arrow-batched ``mapInPandas``: payload bytes stream per batch, the
    output is 6 small integers per item — the decode-heavy,
    shuffle-light shape multimodal pipelines need at 100 TB.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _wav_features_pdf(pdf)

    return docs_with_wav.mapInPandas(_decode, schema=WAV_FEATURE_SCHEMA)


def _wav_features_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    import io
    import struct
    import wave

    out = {k: [] for k in (
        "doc_id", "n_samples", "sample_rate", "sum_sq",
        "peak_abs", "n_zero_cross",
    )}
    for did, blob in zip(pdf["doc_id"], pdf["wav"]):
        with wave.open(io.BytesIO(bytes(blob)), "rb") as w:
            n = w.getnframes()
            rate = w.getframerate()
            raw = w.readframes(n)
        s = struct.unpack(f"<{n}h", raw)
        out["doc_id"].append(int(did))
        out["n_samples"].append(n)
        out["sample_rate"].append(rate)
        out["sum_sq"].append(sum(x * x for x in s))
        out["peak_abs"].append(max(abs(x) for x in s))
        out["n_zero_cross"].append(
            sum(1 for a, b in zip(s, s[1:]) if a * b < 0)
        )
    return pd.DataFrame(out)


def wav_features_from_ids(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fused synth→decode (one Python eval node; see module docstring)."""
    return _fused_map(
        docs,
        id_col,
        [lambda pdf: _synth_wav_pdf(pdf, id_col), _wav_features_pdf],
        WAV_FEATURE_SCHEMA,
    )


WAV_FRAME_LEN = 64        # samples per analysis frame (8 ms at 8 kHz)
WAV_SILENCE_SQ = 100_000  # per-sample mean-square floor for voice activity

WAV_FRAME_SCHEMA = (
    "doc_id long, frame_idx long, frame_len long, sum_sq long, "
    "peak_abs long, is_silent boolean"
)


def wav_frame_energy(
    docs_with_wav: DataFrame,
    frame_len: int = WAV_FRAME_LEN,
    silence_sq: int = WAV_SILENCE_SQ,
) -> DataFrame:
    """Windowed audio energy over REAL decoded PCM — the framing pass
    under voice-activity detection, silence trimming, and loudness
    segmentation: the RIFF container decodes once (stdlib ``wave``)
    and each fixed-length frame reports integer energy (Σ s²), peak
    |s|, and a silence flag (``sum_sq < silence_sq · frame_len`` —
    the integer form of mean-square-below-floor, exact on every
    engine). The last partial frame keeps its true length; flag
    semantics stay per-sample-normalized so short frames aren't
    biased silent.

    Same 100 TB shape as :func:`wav_features`: Arrow-batched
    ``mapInPandas``, bytes never round-trip through Python rows, and
    the fan-out is ~n_samples/frame_len small integer rows per item —
    the decode stays the cost, not the shuffle.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _wav_frame_energy_pdf(pdf, frame_len, silence_sq)

    return docs_with_wav.mapInPandas(_decode, schema=WAV_FRAME_SCHEMA)


def _wav_frame_energy_pdf(
    pdf: pd.DataFrame,
    frame_len: int = WAV_FRAME_LEN,
    silence_sq: int = WAV_SILENCE_SQ,
) -> pd.DataFrame:
    import io
    import struct
    import wave

    out = {k: [] for k in (
        "doc_id", "frame_idx", "frame_len", "sum_sq",
        "peak_abs", "is_silent",
    )}
    for did, blob in zip(pdf["doc_id"], pdf["wav"]):
        with wave.open(io.BytesIO(bytes(blob)), "rb") as w:
            n = w.getnframes()
            raw = w.readframes(n)
        s = struct.unpack(f"<{n}h", raw)
        for fi in range(0, n, frame_len):
            fr = s[fi : fi + frame_len]
            ssq = sum(x * x for x in fr)
            out["doc_id"].append(int(did))
            out["frame_idx"].append(fi // frame_len)
            out["frame_len"].append(len(fr))
            out["sum_sq"].append(ssq)
            out["peak_abs"].append(max(abs(x) for x in fr))
            out["is_silent"].append(ssq < silence_sq * len(fr))
    return pd.DataFrame(out)


def wav_frame_energy_from_ids(
    docs: DataFrame,
    id_col: str = "doc_id",
    frame_len: int = WAV_FRAME_LEN,
    silence_sq: int = WAV_SILENCE_SQ,
) -> DataFrame:
    """Fused synth→frame-energy (one Python eval node)."""
    return _fused_map(
        docs,
        id_col,
        [
            lambda pdf: _synth_wav_pdf(pdf, id_col),
            lambda pdf: _wav_frame_energy_pdf(pdf, frame_len, silence_sq),
        ],
        WAV_FRAME_SCHEMA,
    )


# ---------------------------------------------------------------------------
# REAL image codec path: BMP (BITMAPINFOHEADER, 24-bit) via stdlib struct.
# ---------------------------------------------------------------------------

BMP_BASE_W = 8
BMP_BASE_H = 6


def _bmp_pixel(item_id: int, x: int, y: int) -> tuple[int, int, int]:
    """(b, g, r) of the synthetic image — the closed form the oracle
    recomputes."""
    return (
        (item_id + 3 * x + 7 * y) % 256,
        (item_id * 5 + x) % 256,
        (y * 11 + item_id) % 256,
    )


def synth_bmp_bytes(item_id: int) -> bytes:
    """A genuine 24-bit BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
    bottom-up rows, 4-byte row padding) of ``(8 + id mod 8) ×
    (6 + id mod 6)`` pixels."""
    import struct

    w = BMP_BASE_W + item_id % 8
    h = BMP_BASE_H + item_id % 6
    stride = (w * 3 + 3) // 4 * 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up, per the format
        row = bytearray()
        for x in range(w):
            row.extend(_bmp_pixel(item_id, x, y))
        row.extend(b"\x00" * (stride - w * 3))
        rows.append(bytes(row))
    pixels = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40
    )
    return header + info + pixels


def _synth_bmp_pdf(pdf: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": pdf[id_col],
            "bmp": [synth_bmp_bytes(int(i)) for i in pdf[id_col]],
        }
    )


def with_bmp_payload(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _synth_bmp_pdf(pdf, id_col)

    return docs.select(id_col).mapInPandas(
        _synth, schema="doc_id long, bmp binary"
    )


BMP_FEATURE_SCHEMA = (
    "doc_id long, width long, height long, sum_b long, sum_g long, "
    "sum_r long, pos_checksum long"
)


def bmp_features(docs_with_bmp: DataFrame) -> DataFrame:
    """REAL image decode: parses the BMP container with stdlib
    ``struct`` — magic, pixel-array offset, dimensions and bit depth
    from the headers; pixel rows read bottom-up with 4-byte stride
    padding, exactly as the format demands. Features: header
    dimensions, per-channel sums, and a POSITION-WEIGHTED checksum
    ``Σ (x + width·y)·blue(x,y)`` — channel sums alone would survive
    an orientation or padding bug; the weighted checksum cannot.

    Oracle-checked against the pixel closed form at three scale
    factors: the hash match proves byte-offset-exact decoding.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _bmp_features_pdf(pdf)

    return docs_with_bmp.mapInPandas(_decode, schema=BMP_FEATURE_SCHEMA)


def _bmp_features_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    import struct

    cols = {k: [] for k in (
        "doc_id", "width", "height", "sum_b", "sum_g", "sum_r",
        "pos_checksum",
    )}
    for did, blob in zip(pdf["doc_id"], pdf["bmp"]):
        b = bytes(blob)
        magic, _, _, _, off = struct.unpack_from("<2sIHHI", b, 0)
        assert magic == b"BM"
        _, w, h, _, bpp = struct.unpack_from("<IiiHH", b, 14)
        assert bpp == 24
        stride = (w * 3 + 3) // 4 * 4
        sb = sg = sr = chk = 0
        for y in range(h):
            # row y (top-down coords) lives at bottom-up slot
            base = off + (h - 1 - y) * stride
            for x in range(w):
                p = base + 3 * x
                blue, green, red = b[p], b[p + 1], b[p + 2]
                sb += blue
                sg += green
                sr += red
                chk += (x + w * y) * blue
        cols["doc_id"].append(int(did))
        cols["width"].append(w)
        cols["height"].append(h)
        cols["sum_b"].append(sb)
        cols["sum_g"].append(sg)
        cols["sum_r"].append(sr)
        cols["pos_checksum"].append(chk)
    return pd.DataFrame(cols)


def bmp_features_from_ids(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fused synth→decode (one Python eval node)."""
    return _fused_map(
        docs,
        id_col,
        [lambda pdf: _synth_bmp_pdf(pdf, id_col), _bmp_features_pdf],
        BMP_FEATURE_SCHEMA,
    )


BMP_RESIZE_W = 4
BMP_RESIZE_H = 3


def bmp_resize(
    docs_with_bmp: DataFrame, tw: int = BMP_RESIZE_W, th: int = BMP_RESIZE_H
) -> DataFrame:
    """REAL image resize: nearest-neighbor downsample of genuine BMP
    bytes, emitting genuine BMP bytes — the decode AND encode halves of
    the codec both run on every row. Source pixel for target ``(tx,
    ty)`` is ``(tx·w div tw, ty·h div th)`` (integer floor — the
    closed form the oracle recomputes). Output rows are written
    bottom-up with 4-byte stride padding, exactly as the input was
    parsed, so the result is a well-formed 24-bit BMP that
    ``bmp_features`` (or any viewer) can decode.

    Arrow-batched ``mapInPandas``: pure per-row work, no shuffle, no
    driver involvement — the shape a 100 TB image-corpus map runs as.
    Feature-verification path: ``bmp_features(bmp_resize(...))``
    decodes the re-encoded bytes, so an encoder bug (stride, row
    order, channel order) breaks the position-weighted checksum
    against the closed-form oracle.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _bmp_resize_pdf(pdf, tw, th)

    return docs_with_bmp.mapInPandas(_resize, schema="doc_id long, bmp binary")


def _bmp_resize_pdf(
    pdf: pd.DataFrame, tw: int = BMP_RESIZE_W, th: int = BMP_RESIZE_H
) -> pd.DataFrame:
    import struct

    out_ids: list[int] = []
    out_bmps: list[bytes] = []
    for did, blob in zip(pdf["doc_id"], pdf["bmp"]):
        b = bytes(blob)
        magic, _, _, _, off = struct.unpack_from("<2sIHHI", b, 0)
        assert magic == b"BM"
        _, w, h, _, bpp = struct.unpack_from("<IiiHH", b, 14)
        assert bpp == 24
        stride = (w * 3 + 3) // 4 * 4
        tstride = (tw * 3 + 3) // 4 * 4
        rows = []
        for ty in range(th - 1, -1, -1):  # bottom-up, per format
            sy = ty * h // th
            base = off + (h - 1 - sy) * stride
            row = bytearray()
            for tx in range(tw):
                p = base + 3 * (tx * w // tw)
                row.extend(b[p : p + 3])
            row.extend(b"\x00" * (tstride - tw * 3))
            rows.append(bytes(row))
        pixels = b"".join(rows)
        info = struct.pack(
            "<IiiHHIIiiII",
            40, tw, th, 1, 24, 0, len(pixels), 2835, 2835, 0, 0,
        )
        header = struct.pack(
            "<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40
        )
        out_ids.append(int(did))
        out_bmps.append(header + info + pixels)
    return pd.DataFrame({"doc_id": out_ids, "bmp": out_bmps})


def bmp_resize_features_from_ids(
    docs: DataFrame,
    id_col: str = "doc_id",
    tw: int = BMP_RESIZE_W,
    th: int = BMP_RESIZE_H,
) -> DataFrame:
    """Fused synth→resize→decode: the 3-deep mapInPandas chain (96
    concurrent workers cold, payload across the Arrow boundary 4x)
    becomes one Python eval node with the bytes never leaving the
    worker."""
    return _fused_map(
        docs,
        id_col,
        [
            lambda pdf: _synth_bmp_pdf(pdf, id_col),
            lambda pdf: _bmp_resize_pdf(pdf, tw, th),
            _bmp_features_pdf,
        ],
        BMP_FEATURE_SCHEMA,
    )


WAV_DECIMATE_FACTOR = 4


def wav_decimate(
    docs_with_wav: DataFrame, factor: int = WAV_DECIMATE_FACTOR
) -> DataFrame:
    """REAL audio downsample: decode the RIFF container, keep every
    ``factor``-th PCM frame (sample ``i·factor`` — zero-order
    decimation, no filter, so the output is a pure integer function of
    the input and stays closed-form checkable), and re-encode a genuine
    WAV at ``rate/factor`` through the stdlib ``wave`` writer. Both
    codec halves run on every row, same contract as ``bmp_resize``.

    Arrow-batched ``mapInPandas``; per-row work only — the decode/
    re-encode map a 100 TB audio corpus runs with zero shuffle.
    Verification path: ``wav_features(wav_decimate(...))`` parses the
    re-encoded container, so a frame-count, rate, or sample-packing
    bug breaks the energy/zero-cross hash against the closed form.
    """

    def _decimate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _wav_decimate_pdf(pdf, factor)

    return docs_with_wav.mapInPandas(_decimate, schema="doc_id long, wav binary")


def _wav_decimate_pdf(
    pdf: pd.DataFrame, factor: int = WAV_DECIMATE_FACTOR
) -> pd.DataFrame:
    import io
    import struct
    import wave

    ids: list[int] = []
    wavs: list[bytes] = []
    for did, blob in zip(pdf["doc_id"], pdf["wav"]):
        with wave.open(io.BytesIO(bytes(blob)), "rb") as r:
            n = r.getnframes()
            rate = r.getframerate()
            raw = r.readframes(n)
        s = struct.unpack(f"<{n}h", raw)
        kept = s[::factor]
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate // factor)
            w.writeframes(struct.pack(f"<{len(kept)}h", *kept))
        ids.append(int(did))
        wavs.append(buf.getvalue())
    return pd.DataFrame({"doc_id": ids, "wav": wavs})


def wav_decimate_features_from_ids(
    docs: DataFrame,
    id_col: str = "doc_id",
    factor: int = WAV_DECIMATE_FACTOR,
) -> DataFrame:
    """Fused synth→decimate→decode (see bmp_resize_features_from_ids)."""
    return _fused_map(
        docs,
        id_col,
        [
            lambda pdf: _synth_wav_pdf(pdf, id_col),
            lambda pdf: _wav_decimate_pdf(pdf, factor),
            _wav_features_pdf,
        ],
        WAV_FEATURE_SCHEMA,
    )


DHASH_GRID = 8                         # luma grid: 8 rows x 8 cols
DHASH_BITS = (DHASH_GRID - 1) * DHASH_GRID  # 7 gradients/row x 8 rows = 56
DHASH_BANDS = 4
DHASH_BAND_BITS = DHASH_BITS // DHASH_BANDS  # 14
DHASH_MAX_HAMMING = DHASH_BANDS - 1    # pigeonhole-exhaustive radius

DHASH_SCHEMA = "doc_id long, width long, height long, dhash long"


def image_dhash(docs_with_bmp: DataFrame) -> DataFrame:
    """Perceptual difference-hash over REAL decoded BMPs — the image
    analogue of SimHash: an 8x8 nearest-neighbor luma grid from the
    actual pixel array (bottom-up rows, stride padding — the genuine
    codec path), 7 horizontal gradient sign bits per row, packed into
    a 56-bit BIGINT. Gradient signs survive brightness shifts and
    re-encodes that byte hashes cannot, which is why image dedup
    pipelines key on dHash, not md5.

    56 bits (not the textbook 64) keeps the hash inside a SIGNED
    BIGINT on every engine — no two's-complement edge to mirror.
    Arrow-batched mapInPandas: the decode is the cost; output is 4
    small integers per image. Returns ``(doc_id, width, height,
    dhash)``.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _image_dhash_pdf(pdf)

    return docs_with_bmp.mapInPandas(_decode, schema=DHASH_SCHEMA)


def _image_dhash_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    import struct

    g = DHASH_GRID
    cols = {k: [] for k in ("doc_id", "width", "height", "dhash")}
    for did, blob in zip(pdf["doc_id"], pdf["bmp"]):
        b = bytes(blob)
        magic, _, _, _, off = struct.unpack_from("<2sIHHI", b, 0)
        assert magic == b"BM"
        _, w, h, _, bpp = struct.unpack_from("<IiiHH", b, 14)
        assert bpp == 24
        stride = (w * 3 + 3) // 4 * 4

        def luma(gx: int, gy: int) -> int:
            x, y = gx * w // g, gy * h // g
            p = off + (h - 1 - y) * stride + 3 * x
            return (b[p] + b[p + 1] + b[p + 2]) // 3

        dh = 0
        for gy in range(g):
            row = [luma(gx, gy) for gx in range(g)]
            for gx in range(g - 1):
                if row[gx + 1] > row[gx]:
                    dh |= 1 << (gy * (g - 1) + gx)
        cols["doc_id"].append(int(did))
        cols["width"].append(w)
        cols["height"].append(h)
        cols["dhash"].append(dh)
    return pd.DataFrame(cols)


def image_dhash_from_ids(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fused synth→dhash (one Python eval node)."""
    return _fused_map(
        docs,
        id_col,
        [lambda pdf: _synth_bmp_pdf(pdf, id_col), _image_dhash_pdf],
        DHASH_SCHEMA,
    )


def image_dup_pairs(docs_with_bmp: DataFrame) -> DataFrame:
    """Near-duplicate IMAGE pairs: dHash fingerprints band-bucketed
    (4 bands x 14 bits) into candidates, verified with the exact
    Hamming distance — identical plumbing to the text SimHash
    detector, so the radius-(bands-1) guarantee is pigeonhole-
    exhaustive: any pair within ``DHASH_MAX_HAMMING`` shares at least
    one untouched band and MUST surface as a candidate.

    The decode runs once per image (the Arrow stage); banding,
    joining, and ``bit_count(xor)`` verification are pure JVM columnar
    ops — at 100 TB the pair detection never re-reads media bytes.
    The fingerprint frame is persisted because THREE plan branches read
    it (the band explode and both verification sides): without the
    cache boundary each branch re-ran the synth+decode Python chain
    (r12 measurement: 14.6 s first run / 4.4-5.2 s repeats with the
    re-derivation vs one decode pass after the persist), and at scale
    re-reading media bytes three times is exactly what this operator
    exists to avoid. 4 small integers per image — GiB-scale at 100 TB.
    Returns ``(doc_a, doc_b, hamming)``.
    """
    return _dup_pairs_from_dhash(
        image_dhash(docs_with_bmp).select("doc_id", "dhash")
    )


def image_dup_pairs_from_ids(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """:func:`image_dup_pairs` with the fused synth→dhash Python stage
    (one eval node instead of two; identical pairs — dhash is a pure
    function of doc_id here)."""
    return _dup_pairs_from_dhash(
        image_dhash_from_ids(docs, id_col).select("doc_id", "dhash")
    )


def _dup_pairs_from_dhash(dh: DataFrame) -> DataFrame:
    dh = dh.persist()
    mask = (1 << DHASH_BAND_BITS) - 1
    # The fingerprint rides WITH its band key through the self-join (8
    # extra bytes per band row) so verification needs NO further joins
    # back to the fingerprint table. The old shape (candidate pairs
    # re-joined against two aliased fingerprint frames) read the
    # decode subtree from FOUR plan branches, and under AQE all four
    # leaf exchanges materialized concurrently — each re-running the
    # synth+decode Python chain before the lazy cache had filled (r12
    # measurement: four identical 4.2 s stage-jobs back to back). Two
    # identical band subtrees remain, which exchange reuse collapses
    # into one; dhash is a function of doc_id, so distinct on the
    # 4-tuple equals distinct on the pair and the verified rows are
    # identical.
    bands = dh.select(
        "doc_id",
        F.col("dhash"),
        F.explode(
            F.array(*[
                (
                    F.lit(band << DHASH_BAND_BITS)
                    + F.shiftrightunsigned(
                        F.col("dhash"), band * DHASH_BAND_BITS
                    ).bitwiseAND(F.lit(mask))
                ).cast("long")
                for band in range(DHASH_BANDS)
            ])
        ).alias("band_key"),
    )
    x, y = bands.alias("x"), bands.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.dhash").alias("ha"),
            F.col("y.dhash").alias("hb"),
        )
        .distinct()
        .withColumn(
            "hamming",
            F.expr("bit_count(ha ^ hb)").cast("int"),
        )
        .filter(F.col("hamming") <= DHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
    )
