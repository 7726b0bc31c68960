from omicidx_etl_spark.cdc.replay import (
    dedup_latest,
    replay_batch,
    replay_log,
)

__all__ = ["dedup_latest", "replay_batch", "replay_log"]
