"""In-place corpus canonicalization: duplicate clusters → one survivor per
cluster, applied to a :class:`~omicidx_etl_spark.lake.table.LakeTable` as
versioned tombstone deletes.

This closes the loop between the training-data dedup family and the CDC
lake: the LSH/exact operators FIND duplicates; a real pipeline must then
DELETE the losers from the corpus table without breaking exactly-once
replay, time travel, or later re-inserts. The reference performs the
analogous cleanup as an imperative superseded-record loop
(``omicidx_etl/sra/catalog.py:212-275``); here it is one declarative
change set committed through ``LakeTable.merge``:

- survivors are the lexicographic-min key of each duplicate cluster
  (deterministic, rerun-stable);
- losers become tombstone events at ``seq_ceiling + 1`` — they supersede
  every stored version, while later genuine change events (higher seqs)
  can still re-insert a key;
- the commit is idempotent under ``(app_id, batch_id)`` like any other
  batch, so a crashed canonicalization rerun is a no-op.

Scale posture: ``exact`` is one hash-groupBy (map-side combinable) + one
key-partitioned join — O(corpus) with no self-join. ``minhash`` shingles
token-id n-grams (pure column exprs, no UDF), aggregates K minhashes in
one wide groupBy, bands them, and bucket-joins candidates
(``functions.dedup``) — never all-pairs — then takes the transitive
closure with :func:`~omicidx_etl_spark.functions.dedup.connected_components`.
The delete itself is ``mode="mor"`` by default: an O(losers) delta append,
no base rewrite.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from omicidx_etl_spark.functions import dedup as D


def token_shingles(col: Column, n: int = 3) -> Column:
    """Token-id n-gram shingles ('17|4|523' strings) from an array<int>
    column — the pre-tokenized analogue of word shingles, as a pure column
    expression (JVM-side, codegen). Sequences shorter than ``n`` yield no
    shingles (guarded: Spark's ``sequence(1, size-n+1)`` would DESCEND for
    size < n and fabricate windows)."""
    s = F.transform(col, lambda x: x.cast("string"))
    win = F.transform(
        F.sequence(F.lit(1), F.size(s) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(s, i, n), "|"),
    )
    return F.when(F.size(s) >= n, win).otherwise(
        F.array().cast("array<string>")
    )


def content_key(col: Column) -> Column:
    """Exact-dup content hash for any column type: arrays/structs serialize
    via ``to_json`` (canonical field name, so the hash is alias-stable)."""
    return F.md5(F.to_json(F.struct(col.alias("v"))))


def duplicate_losers(
    state: DataFrame,
    key: str,
    content_col: str,
    method: str = "minhash",
    n: int = 3,
    k: int = 8,
    bands: int = 4,
) -> DataFrame:
    """(key, cluster_id) for every NON-canonical member of a duplicate
    cluster in ``state`` (assumed ≤1 row per key — a lake read)."""
    if method == "exact":
        h = state.select(F.col(key), content_key(F.col(content_col)).alias("__h"))
        groups = (
            h.groupBy("__h")
            .agg(F.min(key).alias("cluster_id"), F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
        )
        return (
            h.join(groups, "__h")
            .filter(F.col(key) != F.col("cluster_id"))
            .select(key, "cluster_id")
        )
    if method == "minhash":
        sh = state.repartition(F.col(key)).select(
            F.col(key).alias("doc"),
            F.explode(token_shingles(F.col(content_col), n)).alias("shingle"),
        )
        sigs = D.minhash_from_shingles(sh, k)
        pairs = D.band_pairs(sigs, k, bands)
        cc = D.connected_components(pairs)
        return (
            cc.filter(F.col("is_canonical") == 0)
            .select(F.col("doc_id").alias(key), "cluster_id")
        )
    raise ValueError(f"unknown canonicalize method {method!r}")


def canonicalize(
    table,
    *,
    method: str = "minhash",
    content_col: str = "tokens",
    n: int = 3,
    k: int = 8,
    bands: int = 4,
    app_id: str = "canonicalize",
    batch_id: int | None = None,
    mode: str = "mor",
) -> dict[str, Any]:
    """Delete every non-canonical duplicate from ``table`` in one commit.

    Returns {"method", "deleted", "clusters", "commit": merge summary}.
    Single-logical-writer contract on the ``seq_ceiling + 1`` choice, same
    as ``LakeTable.delete_where``.
    """
    snap = table.snapshot()
    key = snap["table"]["key"]
    state = table.read()
    losers = duplicate_losers(
        state, key, content_col, method=method, n=n, k=k, bands=bands
    )
    # Two driver-side scalars (counts) — the loser set itself never leaves
    # the executors; it flows into merge as a change DataFrame.
    stats = losers.agg(
        F.count(F.lit(1)).alias("d"),
        F.countDistinct("cluster_id").alias("c"),
    ).collect()[0]
    seq = snap.get("seq_ceiling", -1) + 1
    ch = losers.select(
        F.col(key),
        F.lit("D").alias("op"),
        F.lit(seq).cast("long").alias("seq"),
    )
    res = table.merge(
        ch,
        app_id=app_id,
        batch_id=batch_id,
        mode=mode,
        extra_summary={
            "operation": "canonicalize",
            "method": method,
            "deleted": int(stats["d"]),
            "clusters": int(stats["c"]),
        },
    )
    return {
        "method": method,
        "deleted": int(stats["d"]),
        "clusters": int(stats["c"]),
        "commit": res,
    }
