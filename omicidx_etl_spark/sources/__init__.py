from omicidx_etl_spark.sources.io import (
    current_change_batch,
    read_csv_sentinel,
    read_ndjson,
    write_hive_partitioned,
    write_ndjson_gz,
    write_parquet_chunked,
    write_sorted_single_file,
)
from omicidx_etl_spark.sources.range_server import RangeFileServer, parse_range
from omicidx_etl_spark.sources.rest import (
    fetch_offset_feed,
    iter_cursor_pages,
    land_cursor_feed,
    with_retry,
)
from omicidx_etl_spark.sources.xml_feed import (
    parse_xml_records,
    read_xml_feed,
    stream_xml_feed,
    xml_records_schema,
)

__all__ = [
    "RangeFileServer",
    "current_change_batch",
    "fetch_offset_feed",
    "iter_cursor_pages",
    "land_cursor_feed",
    "parse_range",
    "parse_xml_records",
    "read_csv_sentinel",
    "read_ndjson",
    "read_xml_feed",
    "stream_xml_feed",
    "with_retry",
    "write_hive_partitioned",
    "write_ndjson_gz",
    "write_parquet_chunked",
    "write_sorted_single_file",
    "xml_records_schema",
]
