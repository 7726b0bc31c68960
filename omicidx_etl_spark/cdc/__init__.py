from omicidx_etl_spark.cdc.canonicalize import canonicalize, duplicate_losers, token_shingles
from omicidx_etl_spark.cdc.replay import (
    dedup_latest,
    replay_batch,
    replay_log,
)

__all__ = [
    "canonicalize",
    "dedup_latest",
    "duplicate_losers",
    "replay_batch",
    "replay_log",
    "token_shingles",
]
