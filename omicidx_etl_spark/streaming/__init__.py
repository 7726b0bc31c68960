from omicidx_etl_spark.streaming.replay import stream_replay
from omicidx_etl_spark.streaming.stateful import doc_change_stats
from omicidx_etl_spark.streaming.windows import (
    session_event_stats,
    stream_session_stats,
    stream_windowed_stats,
    windowed_event_stats,
)

__all__ = [
    "doc_change_stats",
    "session_event_stats",
    "stream_replay",
    "stream_session_stats",
    "stream_windowed_stats",
    "windowed_event_stats",
]
