"""Token-array normalization — the engine's analogue of the reference's
per-record ``normalize_fn`` hook (``omicidx_etl/sra/mirror_parquet.py:22,42-48,
114-115``), re-expressed as vectorized column expressions and an
Arrow-batched pandas path. Never per-row Python (BASELINE.json input_hint).

Normalization rules (deterministic, order-preserving):
- drop token ids outside [0, vocab_size) (the reference's
  record-vs-schema reconciliation: out-of-domain values are discarded);
- truncate to ``max_len`` tokens;
- recompute ``n_tok`` from the normalized array;
- null/empty arrays stay null-safe (deletes carry null tokens).

Two implementations with identical semantics:
``normalize_tokens_expr``  — pure higher-order functions (filter/slice),
  whole-stage-codegen JVM path; the default in the replay pipeline.
``normalize_tokens_arrow`` — mapInPandas over Arrow batches; exists because
  real normalizers (BPE re-encoding, detokenize/retokenize) need Python
  libraries — this is the plumbing they plug into, kept benchmarked and
  tested against the expression path so the crossing stays honest.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

DEFAULT_VOCAB = 50257
DEFAULT_MAX_LEN = 2048


def normalize_tokens_expr(
    df: DataFrame,
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
    vocab_size: int = DEFAULT_VOCAB,
    max_len: int = DEFAULT_MAX_LEN,
) -> DataFrame:
    """JVM-side normalization: filter out-of-vocab ids, truncate, recount.
    `filter`/`slice` are codegen'd higher-order functions — zero Python."""
    cleaned = F.slice(
        F.filter(
            F.col(tokens_col),
            lambda t: (t >= F.lit(0)) & (t < F.lit(vocab_size)),
        ),
        1,
        max_len,
    )
    return df.withColumn(tokens_col, cleaned).withColumn(
        n_tok_col,
        F.when(F.col(tokens_col).isNotNull(), F.size(F.col(tokens_col))).cast("int"),
    )


def normalize_tokens_arrow(
    df: DataFrame,
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
    vocab_size: int = DEFAULT_VOCAB,
    max_len: int = DEFAULT_MAX_LEN,
) -> DataFrame:
    """Arrow-batched pandas normalization (mapInPandas). Semantics identical
    to ``normalize_tokens_expr``; numpy-vectorized inside each batch."""
    import numpy as np

    schema = df.schema

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            def norm(a):
                if a is None:
                    return None
                arr = np.asarray(a)
                arr = arr[(arr >= 0) & (arr < vocab_size)][:max_len]
                return arr.astype("int32")

            toks = pdf[tokens_col].map(norm)
            pdf = pdf.copy()
            pdf[tokens_col] = toks
            pdf[n_tok_col] = toks.map(lambda a: None if a is None else len(a)).astype(
                "Int32"
            )
            yield pdf

    from omicidx_etl_spark.session import ensure_worker_package

    ensure_worker_package(df.sparkSession)
    return df.mapInPandas(gen, schema)
