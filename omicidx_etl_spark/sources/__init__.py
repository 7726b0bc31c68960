from omicidx_etl_spark.sources.io import (
    current_change_batch,
    read_csv_sentinel,
    read_ndjson,
    write_hive_partitioned,
    write_ndjson_gz,
    write_parquet_chunked,
    write_sorted_single_file,
)

__all__ = [
    "current_change_batch",
    "read_csv_sentinel",
    "read_ndjson",
    "write_hive_partitioned",
    "write_ndjson_gz",
    "write_parquet_chunked",
    "write_sorted_single_file",
]
