"""Training-sequence packing: assign documents to fixed-context bins by
running token count — the concat-and-chop layout every LLM pre-training
loader uses (docs are concatenated in a deterministic order and the stream
is chopped into ctx_len-token sequences).

For each doc the operator emits the bin its first token lands in
(``bin_id = cum_tokens_before // ctx_len``) and the offset of that token
within the bin (``bin_offset = cum_tokens_before % ctx_len``) — enough for
a loader to materialize any bin by seeking the ordered doc stream. Both are
pure integer functions of an order-prefixed token sum, so the whole
operator is a distributed prefix sum.

The reference has no packing stage (it ships metadata, not training
batches); this implements the natural downstream consumer of its
tokenized-sequence tables (BASELINE.json input_hint: ``tokens:
array<int32>, n_tok: int32``).

Two variants, value-identical:

- :func:`pack_sequences` — one window cumsum per ``part_cols`` group; right
  when groups (e.g. per-source shards) are bounded.
- :func:`scalable_pack_sequences` — global order with NO single-partition
  window: range-partition by boundary literals (:func:`range_pid_expr`),
  per-partition token sums (tiny driver pass, ≤ partitions rows), then
  per-partition cumsum + literal offset. Two narrow passes; survives a
  100 TB corpus where any global window would single-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from omicidx_etl_spark.operators.relational import range_pid_expr


def _emit(df: DataFrame, tok_col: str, ctx_len: int, cum_before) -> DataFrame:
    return (
        df.withColumn("__cb", cum_before)
        .withColumn("bin_id", (F.col("__cb") / F.lit(ctx_len)).cast("bigint"))
        .withColumn("bin_offset", (F.col("__cb") % F.lit(ctx_len)).cast("bigint"))
        .drop("__cb")
    )


def pack_sequences(
    df: DataFrame,
    tok_col: str,
    order_col: str,
    ctx_len: int,
    part_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Window-cumsum packing within each ``part_cols`` group (global when
    empty — then the window single-partitions; use
    :func:`scalable_pack_sequences` beyond one executor's worth of rows)."""
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(tok_col).over(w), F.lit(0)).cast("bigint")
    return _emit(df, tok_col, ctx_len, cum_before)


def scalable_pack_sequences(
    df: DataFrame,
    tok_col: str,
    order_col: str,
    ctx_len: int,
    partitions: int = 0,
) -> DataFrame:
    """Distributed prefix-sum packing, value-identical to a global
    :func:`pack_sequences` (``part_cols=()``) but with no single-partition
    stage: partition rows by range boundary literals, collect the
    per-partition token totals (≤ partitions rows driver-side — the same
    two-pass shape as ``scalable_surrogate_ids``), and add each partition's
    starting offset to its local running sum."""
    spark = df.sparkSession
    n = int(partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    pid = range_pid_expr(df, order_col, n)
    with_pid = df.withColumn("__pid", pid)
    sums = (
        with_pid.groupBy("__pid")
        .agg(F.sum(tok_col).cast("bigint").alias("__s"))
        .orderBy("__pid")
        .collect()
    )  # ≤ partitions rows
    offsets, acc = {}, 0
    for r in sums:
        offsets[r["__pid"]] = acc
        acc += r["__s"]
    off = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(tok_col).over(w), F.lit(0))
    cum_before = (local + off[F.col("__pid")]).cast("bigint")
    return _emit(with_pid, tok_col, ctx_len, cum_before).drop("__pid")
