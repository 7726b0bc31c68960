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


def full_ngrams_expr(text_col, n: int):
    """Distinct *full* word n-grams (docs shorter than n words yield an
    empty array — unlike :func:`shingles_expr`, which emits the whole-doc
    join for short docs so every doc has ≥1 shingle). Decontamination
    wants the strict semantics: a 3-word doc shares no 4-gram with
    anything."""
    words = words_expr(text_col)
    return F.when(F.size(words) >= n, shingles_expr(text_col, n)).otherwise(
        F.array().cast("array<string>")
    )


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any full word
    n-gram with an eval/benchmark set (the training-data hygiene step of
    Brown et al. 2020 §C / Dodge et al. 2021 — drop pretraining docs that
    leak test data). Returns ``(id_col, n_hit)`` for contaminated docs,
    n_hit = number of distinct eval n-grams the doc contains.

    100-TB plan: the eval set is always tiny (benchmarks are thousands of
    docs, the corpus is billions), so its distinct n-gram set is built
    once and **broadcast** — the corpus side is a narrow scan → explode →
    broadcast-hash semi-ish join → per-doc count, no corpus shuffle except
    the final per-doc aggregation (map-side combinable). Grams are
    per-doc-distinct at explode time (``array_distinct`` inside
    :func:`shingles_expr`), so ``COUNT(*)`` after the join IS the distinct
    hit count — no count_distinct shuffle.

    Reference analogue: the key-level anti-diff that keeps already-landed
    records out of a batch (``omicidx_etl/pmc_text/extract.py:111-116``),
    lifted from exact ids to n-gram content overlap.
    """
    grams = F.explode(full_ngrams_expr(F.col(text_col), n)).alias("g")
    corpus_g = corpus.select(F.col(id_col), grams)
    eval_g = eval_set.select(grams).distinct()
    return (
        corpus_g.join(F.broadcast(eval_g), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )


def _max_run_expr(arr):
    """Longest run of equal adjacent elements in a *sorted* array — i.e.
    the count of the modal element — as a pure aggregate() fold (zero
    shuffle, zero UDF)."""
    step = (
        "(s, x) -> named_struct("
        "'prev', x, "
        "'run', if(s.prev is not null and x = s.prev, s.run + 1L, 1L), "
        "'best', greatest(s.best, if(s.prev is not null and x = s.prev, s.run + 1L, 1L)))"
    )
    return F.expr(
        f"aggregate(array_sort({arr}), "
        "named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L), "
        f"{step}, s -> s.best)"
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1),
    computed entirely inside the row — no shuffle, no UDF, scales as a
    pure map over the corpus:

    - ``n_words``, ``distinct_ratio_e4`` (unique-word fraction; boilerplate
      and keyword-stuffing score low),
    - ``top_bigram_frac_e4`` (fraction of all bigrams taken by the single
      most frequent bigram; loops/templates score high),
    - ``keep`` — the filter verdict (distinct ratio ≥ 0.30, top-bigram
      fraction ≤ 0.20), thresholds on the fixed-point values so the
      verdict is bit-identical cross-engine.

    The per-row modal-bigram count folds an ``array_sort`` + run-length
    ``aggregate()`` instead of an explode → groupBy → max (which would
    shuffle one row per bigram — at 100 TB that's a corpus-sized shuffle
    for a per-doc statistic). Docs with < 2 words have no bigrams and are
    dropped (matching an inner join against a bigram aggregate).
    """
    words = F.transform(words_expr(F.col(text_col)), F.lower)
    d = df.withColumn("_w", words).filter(F.size("_w") >= 2)
    # adjacent bigrams, order preserved (NOT the distinct shingle set)
    bg = F.zip_with(
        F.slice(F.col("_w"), 1, F.size("_w") - 1),
        F.slice(F.col("_w"), 2, F.size("_w") - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    d = d.withColumn("_bg", bg)
    n_words = F.size("_w").cast("long")
    n_bg = F.size("_bg").cast("long")
    distinct_e4 = F.floor(
        F.size(F.array_distinct("_w")) * F.lit(10000.0) / n_words + F.lit(0.5)
    ).cast("long")
    top_bg_e4 = F.floor(
        _max_run_expr("_bg") * F.lit(10000.0) / n_bg + F.lit(0.5)
    ).cast("long")
    return (
        d.withColumn("n_words", n_words)
        .withColumn("distinct_ratio_e4", distinct_e4)
        .withColumn("top_bigram_frac_e4", top_bg_e4)
        .withColumn(
            "keep",
            (F.col("distinct_ratio_e4") >= 3000) & (F.col("top_bigram_frac_e4") <= 2000),
        )
        .drop("_w", "_bg")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    stride: int = 6,
) -> DataFrame:
    """Fixed-size training-window chunking: split each doc's token stream
    into windows of ``window`` tokens every ``stride`` tokens (overlap =
    window - stride), the classic LLM context-window prep. The final
    chunk may be short. Pure per-row transform + ``posexplode`` — narrow,
    no shuffle; at 100 TB this is a map-only stage whose output feeds
    :mod:`.packing` (token-id sequence packing over the lake table).

    Returns ``(id_col, chunk_id, chunk, n_tok)``.
    """
    words = F.transform(words_expr(F.col(text_col)), F.lower)
    chunks = F.transform(
        F.sequence(F.lit(0), F.size(words) - 1, F.lit(stride)),
        lambda s: F.slice(words, s + 1, window),
    )
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "_toks"))
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.concat_ws(" ", "_toks").alias("chunk"),
            F.size("_toks").cast("long").alias("n_tok"),
        )
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
