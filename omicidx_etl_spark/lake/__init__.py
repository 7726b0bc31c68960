from omicidx_etl_spark.lake.table import LakeTable

__all__ = ["LakeTable"]
