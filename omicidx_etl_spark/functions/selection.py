"""Corpus-selection operators for training-data curation: pick documents
under a global token budget, and rebalance a multi-language corpus toward a
target mixture.

Reference parity: the reference subsets its catalog imperatively per slice
(``omicidx_etl/sra/catalog.py``) and has no budgeted/mixture selection; these
are the natural curation stages over its tokenized-document tables
(BASELINE.json input_hint shape).

Scale posture:

- :func:`budget_select` is a *distributed prefix sum* over the selection
  order (same two-pass shape as ``scalable_pack_sequences`` /
  ``scalable_surrogate_ids``): range-partition by literal boundaries,
  collect per-partition token totals (≤ partitions rows driver-side),
  window only WITHIN partitions. No single-partition global window, and
  partitions whose starting offset already exceeds the budget are pruned
  before the window runs — with budget ≪ corpus (the usual case at 100 TB)
  only the prefix partitions do any work.
- :func:`mixture_thresholds` / :func:`mixture_sample` are a tiny grouped
  count (map-side combinable), a 1-row total broadcast, and a broadcast
  hash-threshold join: the corpus is scanned once and never shuffled.
  Membership is hash-Bernoulli (md5 prefix), so it is resampling-stable
  and the thresholds are exact integer arithmetic — bit-identical across
  engines (no float rates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from omicidx_etl_spark.operators.relational import range_pid_expr

# 16^8: md5's first 8 hex digits as an integer scale for exact-rational
# sampling thresholds (keep iff prefix < floor(rate * 16^8), all BIGINT math)
_HEX8 = 4294967296


def budget_select(
    df: DataFrame,
    tok_col: str,
    id_col: str,
    budget: int,
    partitions: int = 0,
) -> DataFrame:
    """Greedy longest-first selection under a global token budget: order
    docs by (``tok_col`` DESC, ``id_col`` ASC), keep every doc that fits
    entirely within ``budget`` cumulative tokens. Adds ``cum_before`` (the
    exact number of selected-order tokens preceding the doc).

    Equal ``tok_col`` values never straddle range partitions (boundaries
    are literal *values*, compared with ``<=``), so the per-partition
    window's (sort_key, id) order composes into one deterministic global
    order.
    """
    spark = df.sparkSession
    n = int(partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    skdf = df.withColumn("__sk", -F.col(tok_col).cast("long"))
    with_pid = skdf.withColumn("__pid", range_pid_expr(skdf, "__sk", n))
    sums = (
        with_pid.groupBy("__pid")
        .agg(F.sum(tok_col).cast("bigint").alias("__s"))
        .orderBy("__pid")
        .collect()
    )  # ≤ partitions rows of driver-side metadata
    offsets: dict[int, int] = {}
    keep_pids: list[int] = []
    acc = 0
    for r in sums:
        offsets[r["__pid"]] = acc
        # a partition starting at/after the budget cannot contribute:
        # cum_before ≥ offset > budget - 1 token ⇒ nothing fits
        if acc < budget:
            keep_pids.append(r["__pid"])
        acc += r["__s"]
    if not keep_pids:
        return (
            with_pid.filter(F.lit(False))
            .withColumn("cum_before", F.lit(0).cast("bigint"))
            .drop("__sk", "__pid")
        )
    off = F.create_map(
        *[F.lit(x) for p in keep_pids for x in (p, offsets[p])]
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy("__sk", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(tok_col).over(w), F.lit(0))
    cum_before = (local + off[F.col("__pid")]).cast("bigint")
    return (
        with_pid.filter(F.col("__pid").isin(keep_pids))
        .withColumn("cum_before", cum_before)
        .filter(F.col("cum_before") + F.col(tok_col) <= F.lit(budget))
        .drop("__sk", "__pid")
    )


def mixture_thresholds(df: DataFrame, stratum_col: str) -> DataFrame:
    """Per-stratum hash thresholds that rebalance the corpus toward a
    UNIFORM mixture across strata: rate_s = min(1, (N/K)/n_s), expressed as
    the 8-hex-digit string ``floor(N·16^8 / (K·n_s))`` (``'zz'`` = keep
    all, lexicographically above every hex prefix). Returns
    (stratum, n_before, thr)."""
    n = df.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.countDistinct(stratum_col).cast("long").alias("k"),
    )
    per = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n_before")
    )
    return per.crossJoin(F.broadcast(n)).select(
        "stratum",
        "n_before",
        F.when(F.col("n_before") * F.col("k") <= F.col("n_total"), F.lit("zz"))
        .otherwise(
            F.format_string(
                "%08x",
                F.expr(f"n_total * {_HEX8}L DIV (k * n_before)"),
            )
        )
        .alias("thr"),
    )


def mixture_sample(
    df: DataFrame, stratum_col: str, id_col: str
) -> DataFrame:
    """Self-calibrating mixture rebalancing: derive per-stratum keep rates
    from the corpus itself (:func:`mixture_thresholds`) and keep a doc iff
    its md5(id) 8-hex prefix sorts below its stratum's threshold. Over-
    represented strata are downsampled toward N/K docs; strata at/below
    the target are kept whole. Returns the per-stratum census
    (stratum, n_before, n_kept, thr) — the corpus-side work is one
    broadcast join + a combinable count."""
    thr = mixture_thresholds(df, stratum_col)
    key = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    return (
        df.select(F.col(stratum_col).alias("stratum"), F.col(id_col))
        .join(F.broadcast(thr), "stratum")
        .filter(key < F.col("thr"))
        .groupBy("stratum", "n_before", "thr")
        .agg(F.count(F.lit(1)).cast("long").alias("n_kept"))
        .select("stratum", "n_before", "n_kept", "thr")
    )
