"""Text-analysis operators for a training-data pipeline, all JVM-side
column expressions (no Python in the hot path).

Cross-engine determinism: anything hash-based uses md5 hex strings, which
are identical in Spark and DuckDB — so every operator here can be
oracle-checked value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")

# tiny per-language marker lists for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "la", "y", "los"),
    "de": ("der", "die", "und", "das"),
}

# a BPE-ish pre-tokenizer: words, numbers, or single non-space symbols
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words_expr(text_col):
    """Whitespace tokenization, consecutive-space safe."""
    return F.split(F.trim(text_col), r"\s+")


def fix_utf8_expr(bin_col):
    """D4 — lossy UTF-8 re-encode of a binary column: invalid byte
    sequences are dropped, valid text passes through unchanged. The
    reference streams whole files through
    ``line.decode("utf-8", errors="ignore").encode("utf-8")``
    (``omicidx_etl/nih_reporter.py:123-135``); on Spark the same cleanup is
    a pure column expression (decode-with-replacement, then strip the
    U+FFFD replacement chars), fully codegen — no per-row Python, no file
    staging pass. The binary→string CAST (not ``F.decode``, which is strict
    ANSI in Spark 4 and throws MALFORMED_CHARACTER_CODING) replaces invalid
    sequences JVM-side. Caveat: legitimate pre-existing U+FFFD chars are
    dropped too (the cost of expressing "ignore" via "replace")."""
    return F.regexp_replace(bin_col.cast("string"), "�", "")


def fix_encoding(df: DataFrame, bin_col: str, out_col: str = "text") -> DataFrame:
    """Apply :func:`fix_utf8_expr` to a raw-bytes column — the ingest-edge
    cleanup for feeds that ship mixed/broken encodings (reference:
    ``fix_encoding``, nih_reporter.py:123)."""
    return df.withColumn(out_col, fix_utf8_expr(F.col(bin_col)))


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish regex token counts per document."""
    return df.withColumn(
        "n_words", F.size(words_expr(F.col(text_col)))
    ).withColumn(
        "n_bpe_tokens",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_REGEX), F.lit(0))),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality signals and a
    composite keep/drop score — the C4/Gopher-style heuristic family."""
    words = words_expr(F.col(text_col))
    n_words = F.size(words)
    n_chars = F.length(F.col(text_col))
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^\w\s]"), F.lit(0)))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w))))
    mean_word_len = (n_chars - (n_words - 1)) / n_words
    return (
        df.withColumn("n_words", n_words)
        .withColumn("n_chars", n_chars.cast("long"))
        .withColumn("punct_ratio", F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6))
        .withColumn("stopword_ratio", F.round(n_stop / F.greatest(n_words, F.lit(1)), 6))
        .withColumn("mean_word_len", F.round(mean_word_len, 6))
        .withColumn(
            "quality_keep",
            (n_words >= 5)
            & (F.col("punct_ratio") < 0.3)
            & (F.col("mean_word_len") >= 2)
            & (F.col("mean_word_len") <= 12),
        )
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic: argmax of per-language marker hits.

    Deterministic tie-break: higher count wins, then language code asc;
    zero hits → 'und'. Pure column expressions (array of structs + max)."""
    words = F.transform(words_expr(F.col(text_col)), F.lower)
    scored = F.array(
        *[
            F.struct(
                F.size(
                    F.filter(
                        words,
                        lambda w: F.array_contains(
                            F.array(*[F.lit(m) for m in marks]), w
                        ),
                    )
                ).alias("hits"),
                # invert code ordering so array_max's lexicographic struct
                # compare breaks ties toward the *smaller* language code
                F.lit(-ord(code[0]) * 256 - ord(code[1])).alias("inv"),
                F.lit(code).alias("lang"),
            )
            for code, marks in sorted(LANG_MARKERS.items())
        ]
    )
    best = F.array_max(scored)
    return df.withColumn(
        "lang_pred",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def shingles_expr(text_col, n: int = 3):
    """Word n-gram shingles as strings (distinct set per doc).

    Implementation: a zip_with chain over n shifted slices of the word
    array — n-1 whole-array zips instead of one ``slice`` per shingle
    position. The naive ``transform(sequence(...), i -> slice(words, i, n))``
    copies an n-element slice per position inside the *interpreted*
    higher-order-function evaluator and measured 4× slower on the same
    input (identical output multiset, verified element-for-element at
    sf0.1). ``concat_ws`` skips the nulls zip_with pads at the tail, which
    reproduces the short-doc semantics (docs with ≤ n words yield their
    full word join; empty docs yield the "" shingle) exactly."""
    words = F.transform(words_expr(text_col), F.lower)
    sz = F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
    acc = F.slice(words, 1, sz)
    for i in range(1, n):
        acc = F.zip_with(
            acc, F.slice(words, i + 1, sz), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.array_distinct(
        F.when(F.size(words) == 0, F.array(F.lit(""))).otherwise(acc)
    )


def fingerprint(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Document fingerprint: min md5 over word-n-gram shingles (a 1-hash
    MinHash — the rolling-hash winnowing analogue, order-invariant and
    cross-engine checkable)."""
    sh = shingles_expr(F.col(text_col), n)
    # spread the per-doc (interpreted higher-order) hashing across cores —
    # a single small parquet file otherwise serializes it onto one task
    nparts = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(nparts).withColumn(
        "fingerprint", F.array_min(F.transform(sh, lambda s: F.md5(s)))
    )
