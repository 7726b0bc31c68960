from omicidx_etl_spark.cdc.canonicalize import (
    build_sig_index,
    canonicalize,
    canonicalize_incremental,
    create_sig_index,
    duplicate_losers,
    token_shingles,
)
from omicidx_etl_spark.cdc.replay import (
    dedup_latest,
    replay_batch,
    replay_log,
)
from omicidx_etl_spark.cdc.feed import apply_feed, list_drops
from omicidx_etl_spark.cdc.subscribe import (
    ChangelogSubscription,
    replicate,
)

__all__ = [
    "ChangelogSubscription",
    "apply_feed",
    "list_drops",
    "replicate",
    "build_sig_index",
    "canonicalize",
    "canonicalize_incremental",
    "create_sig_index",
    "dedup_latest",
    "duplicate_losers",
    "replay_batch",
    "replay_log",
    "token_shingles",
]
