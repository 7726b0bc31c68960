from omicidx_etl_spark.lake.table import (
    CommitConflict,
    ConstraintViolation,
    LakeTable,
)

__all__ = ["CommitConflict", "ConstraintViolation", "LakeTable"]
