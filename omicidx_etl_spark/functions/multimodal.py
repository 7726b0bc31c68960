"""Multimodal column plumbing: image/audio as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas``.

Real decode, stdlib-only: WAV (RIFF chunk walk + PCM16 stats) and PPM
(P6 header + per-channel pixel sums) are parsed from actual bytes — no
image/audio libraries needed. A payload that is neither is classified
``unknown`` with byte-level stats (never an exception: at 100 TB a corrupt
payload must degrade to a row, not kill a stage). Heavier formats
(JPEG/MP3/video) would slot into :func:`decode_media`'s magic-number
dispatch without touching the Spark plan — the schema, batching and
partitioning below are the production path.

Reference parity: the reference treats large binary artifacts as opaque
payloads moved by path and parsed per-record in Python
(omicidx_etl/sra/mirror_parquet.py:22 — per-record parse hook); here the
per-record hook is an Arrow-batched pandas function over a binary column.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("head_hex", T.StringType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("amp_abs_sum", T.LongType()),
        T.StructField("amp_peak", T.IntegerType()),
        T.StructField("px_sum_r", T.LongType()),
        T.StructField("px_sum_g", T.LongType()),
        T.StructField("px_sum_b", T.LongType()),
    ]
)


def to_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Treat document text as an opaque binary payload + typed metadata —
    the multimodal storage shape: (id, payload:binary, media_type, n_bytes)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
    )


# ---------------------------------------------------------------------------
# Encoders (deterministic fixture synthesis — tests and benchmarks only)
# ---------------------------------------------------------------------------

def encode_wav_pcm16(samples, sample_rate: int = 8000, channels: int = 1) -> bytes:
    """Minimal but spec-correct RIFF/WAVE container around PCM16 samples."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6), maxval 255; ``rgb`` is width*height*3 flat bytes."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


# ---------------------------------------------------------------------------
# Real decoders (stdlib + numpy; run inside the Arrow batch on executors)
# ---------------------------------------------------------------------------

def _decode_wav(b: bytes) -> dict | None:
    """RIFF chunk walk: fmt_ gives (channels, rate, bits); data gives PCM.
    Returns None when the container is malformed (caller degrades to
    ``unknown`` rather than raising)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, channels, rate, bits, raw = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        payload = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and size >= 16:
            _, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", payload, 0)
        elif cid == b"data":
            raw = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if raw is None or bits != 16 or not channels:
        return None
    samples = np.frombuffer(raw[: len(raw) - (len(raw) % 2)], dtype="<i2").astype(np.int64)
    a = np.abs(samples)
    return {
        "media_kind": "wav",
        "channels": int(channels),
        "sample_rate": int(rate),
        "n_samples": int(samples.size // channels),
        "amp_abs_sum": int(a.sum()) if samples.size else 0,
        "amp_peak": int(a.max()) if samples.size else 0,
    }


def _decode_ppm(b: bytes) -> dict | None:
    """Binary PPM (P6): whitespace/comment-tolerant header, then raw RGB."""
    if b[:2] != b"P6":
        return None
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(b):
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and b[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            return None
        fields.append(int(b[start:pos]))
    if len(fields) < 3 or pos >= len(b):
        return None
    pos += 1  # single whitespace byte after maxval
    w, h, maxval = fields
    need = w * h * 3
    if maxval > 255 or len(b) - pos < need:
        return None
    px = np.frombuffer(b, dtype=np.uint8, count=need, offset=pos).reshape(-1, 3)
    sums = px.sum(axis=0, dtype=np.int64)
    return {
        "media_kind": "ppm",
        "width": int(w),
        "height": int(h),
        "channels": 3,
        "px_sum_r": int(sums[0]),
        "px_sum_g": int(sums[1]),
        "px_sum_b": int(sums[2]),
    }


def decode_media(payload: bytes) -> dict:
    """Magic-number dispatch to a real format parser; corrupt or unknown
    payloads classify as ``unknown`` instead of raising."""
    b = bytes(payload)
    out = _decode_wav(b) or _decode_ppm(b)
    return out if out is not None else {"media_kind": "unknown"}


def extract_features(binary_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched byte-level feature extraction over binary payloads
    (length / head-hex / derived fake dims). Kept as the cheap
    metadata-only pass; :func:`extract_media_features` is the real decode."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payload.map(len).astype("int32"),
                    "head_hex": payload.map(lambda b: bytes(b[:4]).hex()),
                }
            )
            out["fake_width"] = (out["n_bytes"] % 640).astype("int32")
            out["fake_height"] = (out["n_bytes"] % 480).astype("int32")
            yield out

    from omicidx_etl_spark.session import ensure_worker_package

    ensure_worker_package(binary_df.sparkSession)
    return binary_df.mapInPandas(gen, FEATURE_SCHEMA)


def extract_media_features(
    binary_df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL media decode over binary payloads, Arrow-batched.

    Each batch's payloads are parsed by format (WAV → PCM amplitude stats,
    PPM → per-channel pixel sums); unparseable bytes yield an ``unknown``
    row. One output row per input row, so the operator is map-shaped: no
    shuffle, scales linearly with input splits."""

    cols = [f.name for f in MEDIA_SCHEMA.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                d = decode_media(payload)
                d["doc_id"] = int(doc_id)
                rows.append(d)
            out = pd.DataFrame(rows)
            for c in cols:
                if c not in out.columns:
                    out[c] = None
            yield out[cols]

    from omicidx_etl_spark.session import ensure_worker_package

    ensure_worker_package(binary_df.sparkSession)
    return binary_df.mapInPandas(gen, MEDIA_SCHEMA)


def synth_media_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic media fixture: even ids → a real WAV (PCM16, mono),
    odd ids → a real PPM (P6). Formulas are pure integer arithmetic on the
    id so an external oracle can compute the decoded stats analytically:

      WAV:  n = 64 + id%64, rate = 8000 + (id%8)*500,
            sample[i] = ((id*31 + i*17) % 2001) - 1000
      PPM:  w = 4 + id%5, h = 3 + id%4,
            byte(pixel j, channel c) = (id*7 + j*13 + c*29) % 256
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                if i % 2 == 0:
                    n = 64 + i % 64
                    rate = 8000 + (i % 8) * 500
                    idx = np.arange(n, dtype=np.int64)
                    samples = (i * 31 + idx * 17) % 2001 - 1000
                    payloads.append(encode_wav_pcm16(samples, rate))
                else:
                    w, h = 4 + i % 5, 3 + i % 4
                    j = np.repeat(np.arange(w * h, dtype=np.int64), 3)
                    c = np.tile(np.arange(3, dtype=np.int64), w * h)
                    rgb = ((i * 7 + j * 13 + c * 29) % 256).astype(np.uint8).tobytes()
                    payloads.append(encode_ppm(w, h, rgb))
                ids.append(i)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    from omicidx_etl_spark.session import ensure_worker_package

    ensure_worker_package(df.sparkSession)
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(gen, schema)
