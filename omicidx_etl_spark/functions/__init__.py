from omicidx_etl_spark.functions import text, dedup, similarity, multimodal  # noqa: F401
