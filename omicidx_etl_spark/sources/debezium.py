"""Debezium-style JSON change-envelope normalizer (S6 connector family).

The reference tails change feeds as entity-specific JSON files and
normalizes each record imperatively (``omicidx_etl/sra/catalog.py:141-210``,
per-record Python). The lakehouse-native equivalent is the standard
binlog/WAL envelope Debezium (and most CDC relays) emit per change:

    {"before": {...}|null, "after": {...}|null,
     "op": "c"|"u"|"r"|"d", "ts_ms": 1700000000000,
     "source": {"lsn": 123456, ...}}

optionally wrapped in Kafka-Connect framing (``{"schema": ..., "payload":
<envelope>}``). :func:`debezium_changes` turns a DataFrame carrying those
JSON strings into this engine's change-set contract — one row per event
with the row columns, a monotonic ``seq`` and an ``op`` in {U, D} — ready
for ``cdc.dedup_latest`` → ``LakeTable.merge`` or ``merge_into``.

Everything is a column expression over ``from_json`` (JVM Jackson parse,
whole-stage codegen): no Python touches row data, so the normalizer runs
at scan speed and scales with executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: ops that carry the row image in ``after`` and mean "upsert":
#: c = insert, u = update, r = snapshot read (initial load)
_UPSERT_OPS = ("c", "u", "r")


def envelope_schema(
    row_schema: T.StructType,
    source_fields: "list[T.StructField] | None" = None,
) -> T.StructType:
    """The Debezium envelope schema for a given row payload schema.

    ``source_fields`` extends the ``source`` block (default carries only
    ``lsn``); unknown JSON fields are ignored by ``from_json``, so a real
    connector's richer source block parses fine.
    """
    src = T.StructType(
        [T.StructField("lsn", T.LongType())] + list(source_fields or [])
    )
    return T.StructType(
        [
            T.StructField("before", row_schema),
            T.StructField("after", row_schema),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("source", src),
        ]
    )


def debezium_changes(
    raw: DataFrame,
    row_schema: T.StructType,
    json_col: str = "value",
    *,
    wrapped: bool = False,
    seq: "Column | None" = None,
    op_col: str = "op",
    seq_col: str = "seq",
    source_fields: "list[T.StructField] | None" = None,
) -> DataFrame:
    """Parse Debezium JSON envelopes into the engine change-set contract.

    Returns one row per event: the row image columns (``after`` for
    c/u/r, ``before`` for d — deletes carry only the old image), plus
    ``seq`` (default ``coalesce(source.lsn, ts_ms)`` — LSN when the relay
    provides it, event time otherwise; override with any Column over the
    parsed envelope ``e``) and ``op`` ∈ {U, D}. Envelopes whose ``op`` is
    unknown or whose row image is entirely null parse to null columns and
    should be routed to quarantine by the caller's validation hook.

    ``wrapped=True`` unwraps Kafka-Connect framing (``payload`` field).
    """
    env = envelope_schema(row_schema, source_fields)
    if wrapped:
        env = T.StructType([T.StructField("payload", env)])
    e = F.from_json(F.col(json_col), env)
    if wrapped:
        e = e["payload"]
    parsed = raw.select(e.alias("e"))
    is_del = F.col("e.op") == F.lit("d")
    image = F.when(is_del, F.col("e.before")).otherwise(F.col("e.after"))
    seq_expr = (
        seq
        if seq is not None
        else F.coalesce(F.col("e.source.lsn"), F.col("e.ts_ms"))
    )
    op = (
        F.when(is_del, F.lit("D"))
        .when(F.col("e.op").isin(*_UPSERT_OPS), F.lit("U"))
        .otherwise(F.lit(None).cast("string"))
    )
    return parsed.select(
        image.alias("__row"),
        seq_expr.cast("long").alias(seq_col),
        op.alias(op_col),
    ).select("__row.*", seq_col, op_col)


def to_debezium_json(
    df: DataFrame,
    row_cols: list[str],
    *,
    op: Column,
    lsn: Column,
    ts_ms: "Column | None" = None,
    wrapped: bool = False,
) -> DataFrame:
    """Inverse of :func:`debezium_changes` — encode rows as envelope JSON
    (column ``value``). Used by tests/oracle queries to prove the decode
    path lossless, and handy for emitting a relay-compatible feed from the
    table's own ``changes()`` stream. ``op`` must evaluate to c/u/r/d;
    deletes put the image in ``before``, everything else in ``after``."""
    image = F.struct(*[F.col(c) for c in row_cols])
    is_del = op == F.lit("d")
    env = F.struct(
        F.when(is_del, image).alias("before"),
        F.when(~is_del, image).alias("after"),
        op.alias("op"),
        (ts_ms if ts_ms is not None else F.lit(None).cast("long")).alias("ts_ms"),
        F.struct(lsn.cast("long").alias("lsn")).alias("source"),
    )
    if wrapped:
        env = F.struct(env.alias("payload"))
    return df.select(F.to_json(env).alias("value"))
