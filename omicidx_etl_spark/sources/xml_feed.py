"""XML feed source — SURVEY.md §2.1 S4 + §2.10 D1, Spark-first.

The reference streams remote ``.xml.gz`` mirror files into per-record dicts
with a third-party per-record parser
(``omicidx_etl/sra/mirror_parquet.py:25-39`` →
``sra_object_generator``; Medline XML ``omicidx_etl/etl/pubmed.py:93-100``;
BioSample ``omicidx_etl/biosample/extract.py:135``) — a single-threaded
driver loop. Here the same capability is a distributed scan: Spark's
``binaryFile`` source lists + reads the feed files task-parallel, and an
Arrow-batched ``mapInPandas`` parser (stdlib ``xml.etree`` iterparse —
bounded memory per file, elements freed as consumed) explodes each file
into one row per ``<record_tag>`` element. Gzip is sniffed per file
(magic ``1f 8b``), so mixed ``.xml`` / ``.xml.gz`` feeds need no staging,
matching the reference's stream-don't-stage contract.

Field extraction uses ElementTree's limited-XPath ``find`` paths relative
to the record element:

- ``"@accession"``          → attribute of the record element
- ``"TITLE"``               → text of a child element
- ``"IDENTIFIERS/PRIMARY_ID"`` → nested element text
- ``"PLATFORM//INSTRUMENT_MODEL"`` → first match at any depth
- ``"RUN_ATTRIBUTES/RUN_ATTRIBUTE@units"`` → attribute of a nested element

All extracted values land as nullable strings (the reference's record
dicts are string-typed at this stage too; typing happens in the staging
projection P1-P4/``try_cast``). Per-file parse failures are isolated, not
fatal: a malformed file yields a single row with ``_error`` set and null
fields — the T6 quarantine posture applied to the parse stage.

Scale: one task per feed file (Spark packs small files per
``maxPartitionBytes``); no shuffle — parse is mapper-side, and the output
feeds the normal staging projections. At 100 TB the listing itself is the
only driver-side cost.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

#: Fixed schema of Spark's binaryFile source (needed explicitly for
#: readStream, which requires a user-supplied schema for file sources).
BINARY_FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("modificationTime", T.TimestampType(), False),
        T.StructField("length", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def xml_records_schema(fields: dict[str, str]) -> T.StructType:
    """Output schema for ``parse_xml_records``: one nullable string per
    extracted field, plus provenance (``_source_file``) and the per-file
    parse-failure channel (``_error``)."""
    cols = [T.StructField(name, T.StringType(), True) for name in fields]
    cols.append(T.StructField("_source_file", T.StringType(), True))
    cols.append(T.StructField("_error", T.StringType(), True))
    return T.StructType(cols)


def _extract(elem, path: str) -> str | None:
    """Resolve one limited-XPath field path against a record element."""
    if path.startswith("@"):
        return elem.get(path[1:])
    if "@" in path:
        epath, _, attr = path.rpartition("@")
        epath = epath.rstrip("/")
        target = elem.find(epath) if epath else elem
        return None if target is None else target.get(attr)
    target = elem.find(path)
    if target is None:
        return None
    text = target.text
    return text.strip() if isinstance(text, str) else text


def _iter_records(blob: bytes, record_tag: str, fields: dict[str, str]):
    """iterparse one (possibly gzipped) XML blob → field dicts.

    Memory is bounded per record: each ``<record_tag>`` element is cleared
    after extraction, mirroring the reference's streaming parse
    (``mirror_parquet.py:36-39`` reads through GzipFile without staging).
    """
    from xml.etree import ElementTree as ET

    if blob[:2] == b"\x1f\x8b":
        stream: io.RawIOBase = gzip.GzipFile(fileobj=io.BytesIO(blob))
    else:
        stream = io.BytesIO(blob)
    for _event, elem in ET.iterparse(stream, events=("end",)):
        tag = elem.tag.rpartition("}")[2]  # ignore namespaces on the tag
        if tag == record_tag:
            yield {name: _extract(elem, path) for name, path in fields.items()}
            elem.clear()


def parse_xml_records(
    files: DataFrame,
    record_tag: str,
    fields: dict[str, str],
    content_col: str = "content",
    path_col: str = "path",
) -> DataFrame:
    """D1 — per-record XML parser over a DataFrame of file blobs
    (``binaryFile`` rows), as Arrow-batched ``mapInPandas``: one input row
    (file) explodes to N output rows (records). Vectorized at the batch
    level — the per-element work is the parse itself, exactly like the
    reference's ``sra_object_generator`` loop but running once per task
    instead of once on the driver."""
    schema = xml_records_schema(fields)
    field_names = list(fields)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {c.name: [] for c in schema.fields}
            for path, blob in zip(pdf[path_col], pdf[content_col]):
                try:
                    for rec in _iter_records(bytes(blob), record_tag, fields):
                        for name in field_names:
                            out[name].append(rec[name])
                        out["_source_file"].append(path)
                        out["_error"].append(None)
                except Exception as exc:  # malformed file → quarantine row
                    for name in field_names:
                        out[name].append(None)
                    out["_source_file"].append(path)
                    out["_error"].append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(out)

    from omicidx_etl_spark.session import ensure_worker_package

    ensure_worker_package(files.sparkSession)
    return files.mapInPandas(gen, schema)


def read_xml_feed(
    spark: SparkSession,
    path_glob: str,
    record_tag: str,
    fields: dict[str, str],
) -> DataFrame:
    """S4 (batch) — distributed scan of an ``.xml``/``.xml.gz`` feed
    directory → one row per record. The batch twin of ``stream_xml_feed``;
    same parser, same output schema."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.xml*")
        .load(path_glob)
        .select("path", "content")
    )
    return parse_xml_records(files, record_tag, fields)


def stream_xml_feed(
    spark: SparkSession,
    feed_dir: str,
    record_tag: str,
    fields: dict[str, str],
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S4 (streaming) — tail a drop directory of ``.xml(.gz)`` feed files
    as a Structured Streaming source: new files become micro-batches of
    parsed records, composable with the engine's replay/merge sinks
    (T1/T4 exactly-once + back-pressure apply unchanged). The streaming
    re-expression of the reference's poll-the-mirror loop
    (``sra/mirror.py:93-145`` + ``mirror_parquet.py:25-39``).

    ``max_files_per_trigger`` is the back-pressure knob (T4), same as the
    replay stream's ``maxFilesPerTrigger``."""
    reader = (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", "*.xml*")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(feed_dir).select("path", "content")
    return parse_xml_records(files, record_tag, fields)
