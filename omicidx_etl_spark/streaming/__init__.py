from omicidx_etl_spark.streaming.replay import stream_replay
from omicidx_etl_spark.streaming.windows import (
    stream_windowed_stats,
    windowed_event_stats,
)

__all__ = ["stream_replay", "stream_windowed_stats", "windowed_event_stats"]
