"""Z-order clustering (`compact(zorder_by=[...])`).

Lexicographic sort gives tight row-group bounds on the FIRST sort column
only; Morton interleaving makes the bounds of every participating column
tight simultaneously, so a pushed predicate on any of them skips row
groups. These tests check the bit math against a Python reference and the
on-disk layout against the parquet footers (the pruning mechanism itself
is Spark's stock stats-based row-group skipping).
"""

import glob as _glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from omicidx_etl_spark.lake.table import LakeTable
from omicidx_etl_spark.lake.zorder import bounds_from_manifest, zorder_key

XY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
    ]
)


def _xy_changes(spark, n=4096):
    """n distinct keys with independent uniform x, y in [0, n)."""
    return spark.range(n).select(
        F.format_string("d%05d", "id").alias("doc_id"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n)).alias("y"),
        F.lit("U").alias("op"),
        F.col("id").alias("seq"),
    )


def _py_morton(vals, bounds, bits):
    """Reference Morton key: bit j of column i -> position j*len(vals)+i."""
    k = len(vals)
    z = 0
    for i, (v, (lo, hi)) in enumerate(zip(vals, bounds)):
        top = (1 << bits) - 1
        q = 0 if hi <= lo or v is None else min(
            top, max(0, int((v - lo) / (hi - lo) * top))
        )
        for j in range(bits):
            z |= ((q >> j) & 1) << (j * k + i)
    return z


def test_zorder_key_matches_python_reference(spark):
    df = _xy_changes(spark, 512).select(
        "x", "y", zorder_key([("x", "bigint", 0.0, 511.0),
                              ("y", "bigint", 0.0, 511.0)], bits=9)
    )
    for r in df.collect():
        assert r["__zkey"] == _py_morton(
            [r["x"], r["y"]], [(0.0, 511.0), (0.0, 511.0)], bits=9
        )


def test_zorder_key_rejects_strings():
    with pytest.raises(ValueError, match="range locality"):
        zorder_key([("source", "string", 0.0, 1.0)])


def _file_coverage(root, snap, col, full_range):
    """Per-base-file (max-min)/full_range for ``col``; 1.0 = no locality."""
    covs = []
    for entry in snap["buckets"].values():
        base = entry["base"]
        assert entry["deltas"] == []
        for f in _glob.glob(os.path.join(root, base["dir"], "*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = next(
                i for i in range(md.num_columns)
                if md.schema.column(i).name == col
            )
            lo = min(md.row_group(g).column(idx).statistics.min
                     for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max
                     for g in range(md.num_row_groups))
            covs.append((hi - lo) / full_range)
    assert len(covs) >= 8  # the layout must actually have been sliced
    return sum(covs) / len(covs)


def test_zorder_compact_bounds_tight_on_both_dims(spark, tmp_path):
    """compact(zorder_by=['x','y']) leaves EVERY file covering a small
    window of BOTH x and y (lexicographic sort_by=['x'] leaves y at ~full
    range per file), with table contents untouched."""
    n = 4096
    zt = LakeTable.create(spark, str(tmp_path / "z"), XY_SCHEMA,
                          key="doc_id", n_buckets=2)
    zt.merge(_xy_changes(spark, n), mode="mor")
    before = sorted((r.doc_id, r.x, r.y) for r in zt.read().collect())
    zt.compact(zorder_by=["x", "y"], target_records_per_file=128)
    zsnap = zt.snapshot()
    assert sorted((r.doc_id, r.x, r.y) for r in zt.read().collect()) == before

    lt = LakeTable.create(spark, str(tmp_path / "l"), XY_SCHEMA,
                          key="doc_id", n_buckets=2)
    lt.merge(_xy_changes(spark, n), mode="mor")
    lt.compact(sort_by=["x"], target_records_per_file=128)
    lsnap = lt.snapshot()

    zx = _file_coverage(str(tmp_path / "z"), zsnap, "x", n - 1)
    zy = _file_coverage(str(tmp_path / "z"), zsnap, "y", n - 1)
    lx = _file_coverage(str(tmp_path / "l"), lsnap, "x", n - 1)
    ly = _file_coverage(str(tmp_path / "l"), lsnap, "y", n - 1)
    # z-order: both dims localized; lex: only the leading dim is
    assert zx < 0.55 and zy < 0.55, (zx, zy)
    assert lx < 0.25, lx
    assert ly > 0.85, ly
    # z-order trades a little x locality for a lot of y locality
    assert zy < ly / 2


def test_zorder_bounds_come_from_manifest(spark, tmp_path):
    """The quantizer bounds resolve from the snapshot manifest's
    per-file-group stats — no data scan; and they cover the data."""
    t = LakeTable.create(spark, str(tmp_path / "t"), XY_SCHEMA,
                         key="doc_id", n_buckets=2)
    t.merge(_xy_changes(spark, 1024), mode="mor")
    snap = t.snapshot()
    todo = [int(b) for b, e in snap["buckets"].items()]
    got = bounds_from_manifest(snap, todo, ["x", "y"])
    assert got is not None
    agg = t.read().agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y")
    ).first()
    assert got["x"] == (agg[0], agg[1]) and got["y"] == (agg[2], agg[3])
    # a column with no stats anywhere -> None (caller falls back to a scan)
    assert bounds_from_manifest(snap, todo, ["nope"]) is None
