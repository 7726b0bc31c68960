from omicidx_etl_spark.lake.table import CommitConflict, LakeTable

__all__ = ["CommitConflict", "LakeTable"]
