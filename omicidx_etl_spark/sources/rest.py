"""Paginated REST source — SURVEY.md §2.1 S5, Spark-first.

The reference has two REST ingestion shapes:

1. **Cursor pagination** — each response carries the next page's URL
   (``_links.next.href``), so fetching is inherently serial:
   ``SampleFetcher.fetch_next_set`` / ``perform_request``
   (``omicidx_etl/ebi_biosample/extract.py:64-110``), retried with
   exponential backoff (tenacity, 5 attempts, max 40 s).
2. **Offset pagination** — pages are addressable by ``retstart``/``retmax``
   so any page can be fetched independently: the Entrez loop
   (``omicidx_etl/geo/extract.py:197-220``, ``RETMAX=5000``).

Spark-first mapping:

- Cursor feeds stay a **driver-side generator** (the cursor chain cannot be
  parallelized), but records spill to gzipped-NDJSON staging parts as they
  arrive — bounded driver memory, reference S8 posture — and the *parse +
  downstream* work is a distributed ``spark.read.json`` over the parts.
  The driver does I/O only; it never holds the dataset.
- Offset feeds become a **distributed fetch**: a one-column DataFrame of
  page offsets, repartitioned so each task owns a few pages, mapped through
  an Arrow-batched ``mapInPandas`` that calls the fetcher on executors.
  This is the 100 TB path — page fetch scales with the cluster, subject to
  the per-task rate limit.

Both paths share ``with_retry`` (exponential backoff, deterministic
schedule so tests are instant with ``base_delay=0``). Fetchers are
injected as callables — the engine owns pagination/retry/landing, not the
HTTP client, so tests run against stdlib ``http.server`` and production
can use any client.
"""

from __future__ import annotations

import gzip
import json
import os
import time
import uuid
from collections.abc import Callable, Iterable, Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd


def with_retry(
    fn: Callable[..., Any],
    attempts: int = 5,
    base_delay: float = 1.0,
    max_delay: float = 40.0,
) -> Callable[..., Any]:
    """Exponential-backoff retry wrapper — the reference's tenacity policy
    (``ebi_biosample/extract.py:56-63``: 5 attempts, exponential wait
    capped at 40 s) without the dependency. Deterministic schedule
    (base·2^k capped) so behavior is testable; pass ``base_delay=0`` in
    tests."""

    def wrapped(*args: Any, **kwargs: Any) -> Any:
        last: Exception | None = None
        for k in range(attempts):
            try:
                return fn(*args, **kwargs)
            except Exception as exc:  # noqa: BLE001 — retry any fetch error
                last = exc
                if k < attempts - 1:
                    time.sleep(min(base_delay * (2**k), max_delay))
        raise last  # type: ignore[misc]

    return wrapped


def iter_cursor_pages(
    fetch_page: Callable[[str | None], dict],
    first_cursor: str | None = None,
    records_key: str = "records",
    next_key: str = "next",
    attempts: int = 5,
    base_delay: float = 1.0,
    min_interval: float = 0.0,
    page_limit: int | None = None,
) -> Iterator[list[dict]]:
    """Walk a cursor-paginated API: call ``fetch_page(cursor)`` → take
    ``records_key`` → follow ``next_key`` until absent/null. Mirrors
    ``fetch_next_set``'s loop-until-no-next contract
    (``ebi_biosample/extract.py:83-110``, incl. the "no records key ends
    the stream" KeyError path). ``min_interval`` rate-limits politely."""
    fetch = with_retry(fetch_page, attempts=attempts, base_delay=base_delay)
    cursor, pages, last_at = first_cursor, 0, 0.0
    while True:
        if min_interval:
            wait = min_interval - (time.monotonic() - last_at)
            if wait > 0:
                time.sleep(wait)
        last_at = time.monotonic()
        page = fetch(cursor)
        recs = page.get(records_key)
        if not recs:
            return
        yield list(recs)
        pages += 1
        if page_limit is not None and pages >= page_limit:
            return
        cursor = page.get(next_key)
        if not cursor:
            return


def land_cursor_feed(
    spark: SparkSession,
    fetch_page: Callable[[str | None], dict],
    staging_dir: str,
    schema: T.StructType | None = None,
    records_per_part: int = 100_000,
    **cursor_kwargs: Any,
) -> DataFrame:
    """S5 (cursor) — drain a cursor feed to gzipped-NDJSON staging parts
    (bounded driver memory, one part per ``records_per_part`` records —
    the reference's chunked landing, ``biosample/extract.py:130-141``),
    then return a distributed ``spark.read.json`` over the parts. Pass
    ``schema`` to skip the inference pass (S2 guidance)."""
    os.makedirs(staging_dir, exist_ok=True)
    buf: list[dict] = []
    n_parts = 0

    def flush() -> None:
        nonlocal n_parts
        if not buf:
            return
        part = os.path.join(
            staging_dir, f"part-{n_parts:05d}-{uuid.uuid4().hex[:8]}.ndjson.gz"
        )
        with gzip.open(part, "wt", encoding="utf-8") as f:
            for rec in buf:
                f.write(json.dumps(rec, separators=(",", ":")) + "\n")
        buf.clear()
        n_parts += 1

    for page in iter_cursor_pages(fetch_page, **cursor_kwargs):
        buf.extend(page)
        if len(buf) >= records_per_part:
            flush()
    flush()
    if n_parts == 0:
        # An empty feed is a normal outcome for an incremental pull;
        # spark.read.json over zero parts would raise 'Unable to infer
        # schema' instead of returning an empty frame.
        if schema is None:
            raise ValueError(
                "cursor feed returned no records and no schema was given — "
                "pass schema= so an empty incremental pull yields an empty "
                "DataFrame instead of a schema-inference failure"
            )
        return spark.createDataFrame([], schema)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(staging_dir)


def fetch_offset_feed(
    spark: SparkSession,
    fetch_page: Callable[[int, int], Iterable[dict]],
    total: int,
    page_size: int,
    schema: T.StructType,
    fields: list[str] | None = None,
    pages_per_task: int = 4,
    attempts: int = 5,
    base_delay: float = 1.0,
) -> DataFrame:
    """S5 (offset) — distributed fetch of an offset-addressable API:
    ``fetch_page(offset, limit)`` runs on executors via ``mapInPandas``
    over a DataFrame of page offsets (the Entrez ``retstart``/``retmax``
    shape, ``geo/extract.py:197-220``). Each task owns
    ``pages_per_task`` pages; retries are per page. ``schema`` types the
    output (string-typed fields is the reference posture; stage casts come
    later). This is the scale path: fetch throughput grows with executors
    instead of pinning the driver."""
    offsets = list(range(0, total, page_size))
    n_parts = max(1, (len(offsets) + pages_per_task - 1) // pages_per_task)
    pages_df = spark.createDataFrame(
        [(o,) for o in offsets], T.StructType([T.StructField("offset", T.LongType())])
    ).repartition(n_parts, "offset")
    names = fields or [f.name for f in schema.fields]

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        fetch = with_retry(fetch_page, attempts=attempts, base_delay=base_delay)
        for pdf in batches:
            rows: list[dict] = []
            for off in pdf["offset"]:
                for rec in fetch(int(off), page_size):
                    rows.append({n: rec.get(n) for n in names})
            yield pd.DataFrame(rows, columns=names)

    from omicidx_etl_spark.session import ensure_worker_package

    ensure_worker_package(spark)
    return pages_df.mapInPandas(gen, schema)
