"""View layer (S14/A2) + map flattener (D3)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from omicidx_etl_spark.operators import relational as R
from omicidx_etl_spark.plans import views as V
from tests.conftest import SF_SMALL


def test_build_views_and_census(spark):
    names = V.build_views(spark, SF_SMALL)
    assert names == sorted(V.VIEW_SQL)
    cen = {r.table_name: r.row_count for r in V.census(spark).collect()}
    assert set(cen) == set(names)
    # census counts must equal a DuckDB census over the same definitions
    # (views created in the same sorted order — view-on-view layering,
    # like the reference's stg_* -> convenience chain)
    con = duckdb.connect()
    for t in V.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    for name in sorted(V.VIEW_SQL):
        con.sql(f"CREATE VIEW {name} AS {V.VIEW_SQL[name]}")
    for name in sorted(V.VIEW_SQL):
        assert cen[name] == con.sql(f"SELECT count(*) FROM {name}").fetchone()[0], name


def test_views_are_lazy_and_queryable(spark):
    V.build_views(spark, SF_SMALL)
    out = spark.sql(
        "SELECT region, count(*) AS n FROM v_orders_denorm GROUP BY region"
    )
    assert out.count() > 0
    flagged = spark.table("v_customer_has_orders")
    assert flagged.filter(F.col("has_orders")).count() > 0


def test_flatten_map_column(spark):
    df = spark.createDataFrame(
        [(1, {"organism": "human", "tissue": "liver"}), (2, {})],
        "id int, chars map<string,string>",
    )
    flat = R.flatten_map_column(df, "chars")
    row = {r.id: r.chars for r in flat.collect()}
    assert sorted((e.characteristic, e.text) for e in row[1]) == [
        ("organism", "human"),
        ("tissue", "liver"),
    ]
    assert row[2] == []
    # array<struct> schema, not map (the reference's columnar-friendly shape)
    f = dict(flat.dtypes)["chars"]
    assert f.startswith("array<struct")


def test_export_artifact_roundtrip(spark, tmp_path):
    """build-db analogue: materialized artifact + census + metadata must
    read back and match a fresh census of the live view layer."""
    out = str(tmp_path / "artifact")
    meta = V.export_artifact(spark, SF_SMALL, out, views=[
        "v_customer_staging", "v_events_daily", "v_order_part_bridge",
    ])
    assert meta["version"] == 1
    live = {r.table_name: r.row_count for r in V.census(
        spark, [e["name"] for e in meta["views"]]
    ).collect()}
    meta2, frames = V.read_artifact(spark, out)
    assert meta2 == meta
    for e in meta2["views"]:
        assert frames[e["name"]].count() == e["row_count"] == live[e["name"]]
    cen = spark.read.parquet(f"{out}/v00001/census")
    assert {r.table_name: r.row_count for r in cen.collect()} == live
    # a second export becomes v2 and _LATEST moves atomically
    meta3 = V.export_artifact(spark, SF_SMALL, out, views=["v_events_daily"])
    assert meta3["version"] == 2
    assert V.read_artifact(spark, out)[0]["version"] == 2
    assert V.read_artifact(spark, out, version=1)[0]["version"] == 1


def test_namespaced_view_layout(spark):
    """Multi-schema catalog (build_db.py:57 create schema;
    040_geometadb_views.sql:1-3): base tables land as external tables in
    one namespace, curated views in topical namespaces; cross-namespace
    view-on-view layering resolves; the census spans namespaces and
    matches both the flat layer and an independent DuckDB count."""
    import duckdb

    layout = V.build_namespaced_views(spark, SF_SMALL, suffix="_t1")
    assert set(layout) == {"staging_t1", "marts_t1", "ops_t1"}
    # every VIEW_SQL entry lives in exactly one namespace
    placed = [q.split(".", 1)[1] for qs in layout.values() for q in qs]
    assert sorted(placed) == sorted(V.VIEW_SQL)
    # SHOW VIEWS sees them in their namespace
    shown = {r.viewName for r in spark.sql("SHOW VIEWS IN staging_t1").collect()}
    assert "v_customer_staging" in shown
    # cross-namespace view-on-view: urgent lineitems reads the marts denorm
    urgent = spark.table("marts_t1.v_urgent_lineitems")
    assert urgent.filter("o_orderpriority <> '1-URGENT'").count() == 0

    cen = V.census_namespaces(spark, layout)
    got = {(r.namespace, r.table_name): r.row_count for r in cen.collect()}
    assert len(got) == len(V.VIEW_SQL)
    # spot-check against DuckDB and against the flat census
    con = duckdb.connect()
    for t in V.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    for ns, name in [("staging_t1", "v_customer_staging"), ("ops_t1", "v_events_daily")]:
        exp = con.execute(f"SELECT COUNT(*) FROM ({V.VIEW_SQL[name]})").fetchone()[0]
        assert got[(ns, name)] == exp
    con.close()
    V.build_views(spark, SF_SMALL)
    flat = {r.table_name: r.row_count for r in V.census(spark).collect()}
    assert {n: c for (_, n), c in got.items()} == flat
