from omicidx_etl_spark.streaming.replay import stream_replay

__all__ = ["stream_replay"]
