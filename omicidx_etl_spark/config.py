"""Deployment profile from environment variables.

The reference centralizes destination/auth settings in one env-backed
module (``omicidx_etl/config.py:1-34``: PUBLISH_DIRECTORY + object-store
credentials, loaded once and imported everywhere). The engine's jobs take
explicit CLI args — better for reproducible submits — but a deployment
needs ONE place where an operator sets the warehouse/checkpoint/feed
roots and Spark sizing for a whole environment, without editing every
cron line. This module is that place; precedence is always

    explicit CLI arg  >  environment variable  >  default

i.e. jobs resolve a missing path argument through the profile but never
override one the caller passed.

Spark-first: no pydantic/dotenv dependency (stdlib only — the container
contract forbids new installs); object-store credentials are NOT handled
here because Spark reads them from its own conf/Hadoop env
(``spark.hadoop.fs.s3a.*``) — duplicating them in a second config system
is how credentials leak out of rotation.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _int(env: "dict[str, str]", key: str, default: int) -> int:
    raw = env.get(key)
    if raw is None or raw == "":
        return default
    try:
        return int(raw)
    except ValueError:
        raise ValueError(f"{key} must be an integer, got {raw!r}") from None


@dataclass(frozen=True)
class Settings:
    """One deployment environment's roots and Spark sizing."""

    warehouse: str = "/data/lake"          # base dir for LakeTables
    checkpoints: str = "/data/checkpoints" # streaming/subscription offsets
    feeds: str = "/data/feeds"             # CDC export drop dirs
    master: "str | None" = None            # None -> spark-submit decides
    shuffle_partitions: int = 32
    mode: str = "mor"                      # default merge mode
    n_buckets: int = 32                    # default table bucket count
    codec: str = "zstd"

    ENV_PREFIX = "SPARK_GRAFT_"

    @classmethod
    def from_env(cls, env: "dict[str, str] | None" = None) -> "Settings":
        e = os.environ if env is None else env
        p = cls.ENV_PREFIX
        mode = e.get(p + "MODE", cls.mode)
        if mode not in ("mor", "cow"):
            raise ValueError(f"{p}MODE must be 'mor' or 'cow', got {mode!r}")
        return cls(
            warehouse=e.get(p + "WAREHOUSE", cls.warehouse),
            checkpoints=e.get(p + "CHECKPOINTS", cls.checkpoints),
            feeds=e.get(p + "FEEDS", cls.feeds),
            master=e.get(p + "MASTER") or None,
            shuffle_partitions=_int(e, p + "SHUFFLE_PARTITIONS", cls.shuffle_partitions),
            mode=mode,
            n_buckets=_int(e, p + "BUCKETS", cls.n_buckets),
            codec=e.get(p + "CODEC", cls.codec),
        )

    # ---- path resolution (CLI args pass through untouched) ----
    def table_path(self, name_or_path: str) -> str:
        """A bare table NAME resolves under the warehouse; anything with a
        path separator or URI scheme is already a path and passes through."""
        if os.sep in name_or_path or "://" in name_or_path:
            return name_or_path
        return os.path.join(self.warehouse, name_or_path)

    def checkpoint_path(self, name_or_path: str) -> str:
        if os.sep in name_or_path or "://" in name_or_path:
            return name_or_path
        return os.path.join(self.checkpoints, name_or_path)

    def feed_path(self, name_or_path: str) -> str:
        if os.sep in name_or_path or "://" in name_or_path:
            return name_or_path
        return os.path.join(self.feeds, name_or_path)

    def spark_conf(self) -> "dict[str, str]":
        """Session conf for ``session.get_spark(extra_conf=...)``."""
        return {
            "spark.sql.shuffle.partitions": str(self.shuffle_partitions),
            "spark.sql.parquet.compression.codec": self.codec,
        }


def settings(env: "dict[str, str] | None" = None) -> Settings:
    """Fresh profile resolution (no import-time singleton: tests and
    multi-env drivers re-resolve with different env dicts)."""
    return Settings.from_env(env)
