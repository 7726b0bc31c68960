"""Conditional MERGE INTO — Iceberg/Delta ``WHEN MATCHED [AND cond] THEN
UPDATE SET ... | DELETE`` / ``WHEN NOT MATCHED [AND cond] THEN INSERT``
clause semantics, compiled into the engine's versioned change-set form.

The reference's upsert loop overwrites by key unconditionally (each landed
record replaces the stored one — ``omicidx_etl/sra/catalog.py:291-320``);
conditional clauses are the general form every lakehouse MERGE exposes.
Rather than a second write path, the clauses compile to a **minimal change
set** — one row per source key that actually changes something, versioned
at ``target.__seq + 1`` — and flow through :meth:`LakeTable.merge`, so
MOR/COW physical plans, bucket pruning, exactly-once batch ids, branches
and optimistic-concurrency rebase are all inherited unchanged.

Physical plan: ONE left join of the (small) source against the
snapshot-pinned target read, every clause a codegen'd CASE — no UDFs, no
driver-side rows. At 10^10-row scale the join is bucket-prunable on the
source's key set and the unchanged-part of the table is never touched
(MOR: zero base reads at write time).

Isolation: the change set is computed against the snapshot current at call
time (snapshot isolation). Two concurrent ``merge_into`` calls on
overlapping keys can write-skew, exactly as in any snapshot-isolated
engine; for serializable audit-then-swap semantics run the merge on a
branch and ``publish`` it — publish refuses if main advanced past the fork.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .table import DELETED_COL, SEQ_COL

_STAR = "*"


def _expr(e: "Column | str") -> Column:
    return F.expr(e) if isinstance(e, str) else e


def _resolve_set(
    spec: "dict[str, Column | str] | str | None",
    side_cols: list[str],
    target_fields: list[str],
    key: str,
    side: str,
) -> "dict[str, Column] | None":
    """Normalize an UPDATE SET / INSERT VALUES spec to {target_col: Column}.

    ``"*"`` maps every same-named ``side`` column onto the target (the SQL
    ``UPDATE SET *`` / ``INSERT *`` shorthand); the key column is never an
    assignment target (it is the join identity).
    """
    if spec is None:
        return None
    if spec == _STAR:
        return {
            c: F.col(f"{side}.{c}")
            for c in side_cols
            if c in target_fields and c != key
        }
    out = {}
    for name, e in spec.items():
        if name not in target_fields:
            raise ValueError(f"unknown target column {name!r} in merge clause")
        if name == key:
            raise ValueError(f"the merge key {key!r} cannot be assigned")
        out[name] = _expr(e)
    return out


def compile_merge_changes(
    target: DataFrame,
    source: DataFrame,
    key: str,
    user_fields: list[str],
    *,
    update_set: "dict[str, Column | str] | str | None" = None,
    update_condition: "Column | str | None" = None,
    delete_condition: "Column | str | None" = None,
    insert_values: "dict[str, Column | str] | str | None" = None,
    insert_condition: "Column | str | None" = None,
    op_col: str = "op",
    seq_col: str = "seq",
    delete_value: str = "D",
) -> DataFrame:
    """Compile MERGE clauses into a change-set DataFrame (user columns +
    ``op``/``seq``) ready for :meth:`LakeTable.merge`.

    ``target`` must be the system-column read (``include_deleted=True,
    include_system=True``) so tombstoned keys count as NOT MATCHED while
    still yielding the seq floor an insert must exceed. Conditions and
    assignment expressions reference ``source.<col>`` / ``target.<col>``
    (strings are parsed with ``F.expr``). Clause order is DELETE before
    UPDATE, both before (disjoint from) INSERT. Source must carry at most
    one row per key (the standard MERGE multi-match contract — pre-dedup
    with ``cdc.dedup_latest`` when in doubt).
    """
    src_cols = list(source.columns)
    upd = _resolve_set(update_set, src_cols, user_fields, key, "source")
    ins = _resolve_set(insert_values, src_cols, user_fields, key, "source")
    if upd is None and ins is None and delete_condition is None:
        raise ValueError("merge_into needs at least one clause")

    s = source.alias("source")
    t = target.alias("target")
    joined = s.join(t, F.col(f"source.{key}") == F.col(f"target.{key}"), "left")

    # A physically-present target row always has a non-null __deleted flag;
    # a tombstone is physically present but logically absent (NOT MATCHED).
    present = F.col(f"target.{DELETED_COL}").isNotNull()
    matched = present & ~F.col(f"target.{DELETED_COL}")

    del_c = (
        matched & F.coalesce(_expr(delete_condition), F.lit(False))
        if delete_condition is not None
        else F.lit(False)
    )
    upd_c = (
        matched
        & ~del_c
        & (
            F.coalesce(_expr(update_condition), F.lit(False))
            if update_condition is not None
            else F.lit(True)
        )
        if upd is not None
        else F.lit(False)
    )
    ins_c = (
        ~matched
        & (
            F.coalesce(_expr(insert_condition), F.lit(False))
            if insert_condition is not None
            else F.lit(True)
        )
        if ins is not None
        else F.lit(False)
    )

    op = (
        F.when(del_c, F.lit(delete_value))
        .when(upd_c | ins_c, F.lit("U"))
        .otherwise(F.lit(None).cast("string"))
    )
    # strictly above the stored version (tombstones included), so merge()'s
    # seq-guard applies the event and an insert resurrects a deleted key
    seq = (F.coalesce(F.col(f"target.{SEQ_COL}"), F.lit(0)) + F.lit(1)).cast("long")

    def _val(name: str) -> Column:
        if name == key:
            return F.col(f"source.{key}")
        keep = F.col(f"target.{name}")
        v = keep
        if upd is not None and name in upd:
            v = F.when(upd_c, upd[name]).otherwise(keep)
        if ins is not None:
            iv = ins.get(
                name,
                F.col(f"source.{name}") if name in src_cols else F.lit(None),
            )
            v = F.when(ins_c, iv).otherwise(v)
        return v

    return joined.select(
        *[_val(c).alias(c) for c in user_fields],
        op.alias(op_col),
        seq.alias(seq_col),
    ).filter(F.col(op_col).isNotNull())
