"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (image/audio libraries are not in this
container): ``decode_stub`` raises ``NotImplementedError`` unless
``fake=True``, in which case it produces deterministic fake features so the
Spark-side plumbing — schema, batch shape, partitioning — is real and
tested. At scale the only thing that changes is the body of the pandas
function (swap the fake for PIL/torchaudio), not the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

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


def to_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Treat document text as an opaque binary payload + typed metadata —
    the multimodal storage shape: (id, payload:binary, media_type, n_bytes)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
    )


def _decode_real(payload: bytes):
    raise NotImplementedError(
        "real media decode requires PIL/torchaudio — not available in this "
        "container; pass fake=True for the deterministic stub"
    )


def extract_features(
    binary_df: DataFrame, id_col: str = "doc_id", fake: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` receives pandas batches (payload as bytes objects) —
    the exact plumbing a real image resize / audio frame-sample would use.
    Deterministic fake features: byte length, first-4-bytes hex, and a
    "decoded size" derived from the length.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                pdf["payload"].map(_decode_real)
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
