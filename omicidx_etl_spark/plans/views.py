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
