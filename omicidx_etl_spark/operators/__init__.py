from omicidx_etl_spark.operators import relational, cdc_ops  # noqa: F401
