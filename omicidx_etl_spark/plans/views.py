"""View/catalog layer — the reference's ``oidx build-db``
(``omicidx_etl/build_db.py:77-114``): materialize a curated view layer over
the base tables, then census it (per-table row counts,
``build_db.py:53-74`` — A2). On Spark the catalog IS the metastore:
views are session-catalog entries over parquet/lake tables; the census is
``listTables`` + counts; the metadata stamp is the lineage/commit record.

Views are lazy (counting is the first execution), exactly like the
reference's DuckDB views.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

# name -> SQL over the registered base views (040/050-style layer:
# staging projections, denormalized joins, exploded bridges)
VIEW_SQL: dict[str, str] = {
    # 030-style staging: rename + trim + coercion
    "v_customer_staging": """
        SELECT c_custkey AS custkey, trim(c_name) AS name,
               c_nationkey AS nationkey, c_mktsegment AS mktsegment,
               CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS acctbal_cents
        FROM customer
    """,
    # 050-style denormalization chain (J2)
    "v_orders_denorm": """
        SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice,
               c.c_name, n.n_name AS nation, r.r_name AS region
        FROM orders o
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    # 040-style constant-predicate view (P6)
    "v_events_errors": """
        SELECT event_id, ts, user_id, value FROM events
        WHERE event_type = 'error'
    """,
    # 040-style existence flag (J3)
    "v_customer_has_orders": """
        SELECT c.c_custkey,
               CASE WHEN o.o_custkey IS NOT NULL THEN TRUE ELSE FALSE END
                 AS has_orders
        FROM customer c
        LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
          ON c.c_custkey = o.o_custkey
    """,
    # 040-style bridge views (gse_gpl / gse_gsm,
    # 040_geometadb_views.sql:100-113): DISTINCT pair projections off the
    # fact table linking the two entity spaces
    "v_order_part_bridge": """
        SELECT DISTINCT l_orderkey AS orderkey, l_partkey AS partkey
        FROM lineitem
    """,
    "v_order_supplier_bridge": """
        SELECT DISTINCT l_orderkey AS orderkey, l_suppkey AS suppkey
        FROM lineitem
    """,
    # 040-style union-discriminated registry with regexp cleanup
    # (geo_supplemental_files, 040_geometadb_views.sql:115-135): two entity
    # tables folded into one keyed view with a type discriminator column
    "v_account_registry": """
        SELECT * FROM (
            SELECT c_custkey AS id, 'customer' AS kind, trim(c_name) AS name,
                   c_nationkey AS nationkey, c_acctbal AS acctbal,
                   regexp_extract(c_name, '[0-9]+$', 0) AS name_num
            FROM customer
            UNION ALL
            SELECT s_suppkey, 'supplier', trim(s_name),
                   s_nationkey, s_acctbal,
                   regexp_extract(s_name, '[0-9]+$', 0)
            FROM supplier
        ) u
    """,
    # 050-style 4-way left-join denorm (run_with_study,
    # 050_sradb_views.sql:240-272): fact grain preserved, every dimension
    # attached with LEFT JOIN so missing dims never drop rows
    "v_lineitem_denorm": """
        SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, l.l_extendedprice,
               o.o_orderdate, o.o_orderpriority,
               c.c_name AS customer_name, c.c_mktsegment,
               p.p_name AS part_name, p.p_brand,
               s.s_name AS supplier_name
        FROM lineitem l
        LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        LEFT JOIN part p ON l.l_partkey = p.p_partkey
        LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    """,
    # 050-style filtered convenience view over the denorm (rnaseq_runs,
    # 050_sradb_views.sql:274+) — view-on-view, like the reference's
    # stg_* layering (lexical order puts the base view first)
    "v_urgent_lineitems": """
        SELECT * FROM v_lineitem_denorm WHERE o_orderpriority = '1-URGENT'
    """,
    # daily rollup convenience view (A2-adjacent census material)
    "v_events_daily": """
        SELECT CAST(ts AS DATE) AS day, event_type,
               count(*) AS n_events,
               CAST(floor(sum(value)*100 + 0.5) AS BIGINT) AS value_cents
        FROM events
        GROUP BY CAST(ts AS DATE), event_type
    """,
}


def register_base_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register the parquet base tables as temp views (the metastore-less
    sandbox analogue of external tables)."""
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def build_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create the curated view layer; returns view names in creation order
    (lexical, mirroring the reference's 020→050 ordering contract,
    ``build_db.py:86-90``)."""
    register_base_tables(spark, sf_dir)
    for name in sorted(VIEW_SQL):
        spark.sql(f"CREATE OR REPLACE TEMP VIEW {name} AS {VIEW_SQL[name]}")
    return sorted(VIEW_SQL)


def census(spark: SparkSession, names: list[str] | None = None) -> DataFrame:
    """A2 — per-table/view row-count census (``build_db.py:53-74``).
    Returns a DataFrame (table_name, row_count); one count job per view,
    each fully distributed."""
    names = names if names is not None else sorted(VIEW_SQL)
    rows = [(n, spark.table(n).count()) for n in names]
    return spark.createDataFrame(rows, "table_name string, row_count long")


# ---------------------------------------------------------------------------
# Multi-schema namespaces — the reference builds three DuckDB schemas and
# organizes its view layers inside them (``omicidx_etl/build_db.py:57``
# ``create schema``; ``sql/040_geometadb_views.sql:1-3``). The Spark
# analogue is catalog namespaces: base parquet registered as EXTERNAL
# tables in one namespace, curated views created as PERSISTENT catalog
# views inside topical namespaces (works on the in-memory session catalog;
# on a real cluster the identical statements land in HMS/Unity/Glue).
# ---------------------------------------------------------------------------

BASE_NAMESPACE = "base"

# namespace -> view names (every VIEW_SQL entry appears exactly once)
NAMESPACES: dict[str, list[str]] = {
    "staging": ["v_customer_staging", "v_account_registry"],
    "marts": ["v_orders_denorm", "v_lineitem_denorm", "v_urgent_lineitems"],
    "ops": [
        "v_events_errors",
        "v_events_daily",
        "v_customer_has_orders",
        "v_order_part_bridge",
        "v_order_supplier_bridge",
    ],
}


def _qualify(sql: str, ns_of: dict[str, str]) -> str:
    """Fully qualify every base-table and cross-view reference. Explicit
    qualification (rather than current-namespace resolution) matters: a
    same-session TEMP view named ``customer`` would otherwise shadow the
    base table and poison the persistent view (INVALID_TEMP_OBJ_REFERENCE
    — persistent views may not capture temp objects)."""
    import re

    for name, ns in ns_of.items():
        # only relation positions (FROM/JOIN) — a bare-identifier replace
        # would also rewrite column aliases that happen to equal a table
        # name (e.g. "n.n_name AS nation")
        sql = re.sub(
            rf"(?i)\b(FROM|JOIN)(\s+){name}(?![\w.])",
            rf"\1\2{ns}.{name}",
            sql,
        )
    return sql


def build_namespaced_views(
    spark: SparkSession, sf_dir: str, suffix: str = ""
) -> dict[str, list[str]]:
    """Create the multi-schema catalog layout: external base tables under
    ``base``, curated views under ``staging`` / ``marts`` / ``ops``
    (``suffix`` isolates concurrent test builds). Returns
    {namespace: [qualified view names]}."""
    base = BASE_NAMESPACE + suffix
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {base}")
    for t in TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {base}.{t}")
        spark.sql(
            f"CREATE TABLE {base}.{t} USING parquet LOCATION '{sf_dir}/{t}.parquet'"
        )
    ns_of = {n: ns + suffix for ns, names in NAMESPACES.items() for n in names}
    ns_of.update({t: base for t in TABLES})
    out: dict[str, list[str]] = {}
    for ns, names in NAMESPACES.items():
        nsq = ns + suffix
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {nsq}")
        for name in names:
            spark.sql(
                f"CREATE OR REPLACE VIEW {nsq}.{name} AS "
                + _qualify(VIEW_SQL[name], ns_of)
            )
        out[nsq] = [f"{nsq}.{n}" for n in names]
    return out


def census_namespaces(
    spark: SparkSession, layout: dict[str, list[str]]
) -> DataFrame:
    """Cross-namespace census: (namespace, table_name, row_count) for every
    view in the layout — the reference's per-schema count report."""
    rows = [
        (ns, qn.split(".", 1)[1], spark.table(qn).count())
        for ns, qnames in layout.items()
        for qn in qnames
    ]
    return spark.createDataFrame(
        rows, "namespace string, table_name string, row_count long"
    )


def export_artifact(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    views: list[str] | None = None,
) -> dict:
    """Materialize the view layer into one versioned, shippable artifact —
    the reference's ``build-db`` + metadata JSON + upload step
    (``omicidx_etl/build_db.py:77-144``): views as parquet directories, the
    census as a parquet table, and a ``metadata.json`` stamp (version,
    build time, per-view row counts).

    Each view materializes as a fully distributed parquet write; row
    counts are then read back from the written files (a parquet
    metadata-only count — no second pass over the data). Publication is
    atomic: everything stages under a temp dir, one ``os.rename`` makes
    the version visible, and the ``_LATEST`` pointer swaps last — a
    consumer never sees a half-built artifact (same commit discipline as
    the lake's pointer swap).

    Returns the metadata dict (also written to ``metadata.json``).
    """
    import json
    import os
    import time
    import uuid

    names = build_views(spark, sf_dir)
    if views is not None:
        names = [n for n in names if n in set(views)]
    os.makedirs(out_dir, exist_ok=True)
    existing = [
        int(d[1:]) for d in os.listdir(out_dir)
        if d.startswith("v") and d[1:].isdigit()
    ]
    version = max(existing, default=0) + 1
    vname = f"v{version:05d}"
    stage = os.path.join(out_dir, f".tmp-{vname}-{uuid.uuid4().hex}")

    entries = []
    for name in names:
        path = os.path.join(stage, "views", name)
        spark.table(name).write.mode("overwrite").parquet(path)
        n = spark.read.parquet(path).count()  # footer-stat count, no scan
        entries.append({"name": name, "row_count": n, "path": f"views/{name}"})
    spark.createDataFrame(
        [(e["name"], e["row_count"]) for e in entries],
        "table_name string, row_count long",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(stage, "census"))
    metadata = {
        "version": version,
        "built_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "source": sf_dir,
        "views": entries,
    }
    with open(os.path.join(stage, "metadata.json"), "w") as f:
        json.dump(metadata, f, indent=2)
    os.rename(stage, os.path.join(out_dir, vname))
    tmp_ptr = os.path.join(out_dir, f"._latest-{uuid.uuid4().hex}")
    with open(tmp_ptr, "w") as f:
        f.write(vname)
    os.replace(tmp_ptr, os.path.join(out_dir, "_LATEST"))
    return metadata


def read_artifact(
    spark: SparkSession, out_dir: str, version: int | None = None
) -> tuple[dict, dict[str, DataFrame]]:
    """Open an exported artifact: (metadata, {view name -> DataFrame}).
    Defaults to the ``_LATEST`` version."""
    import json
    import os

    if version is None:
        with open(os.path.join(out_dir, "_LATEST")) as f:
            vname = f.read().strip()
    else:
        vname = f"v{version:05d}"
    vdir = os.path.join(out_dir, vname)
    with open(os.path.join(vdir, "metadata.json")) as f:
        metadata = json.load(f)
    frames = {
        e["name"]: spark.read.parquet(os.path.join(vdir, e["path"]))
        for e in metadata["views"]
    }
    return metadata, frames
