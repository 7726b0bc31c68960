"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference keeps cross-batch per-key state implicitly (the "seen" sets
and running counters of T5/A4 — ``pmc_text/extract.py:111-116``,
``biosample/extract.py:101-112``). For the engine's lake path, state lives
in the table itself (versioned merge); this module covers the remaining
shape: per-key running statistics that must survive across micro-batches
WITHOUT landing in the table — e.g. live per-doc change-rate counters for
monitoring.

``doc_change_stats`` is the stateful streaming analogue of
``SELECT doc_id, count(*), max(seq), sum(op='D') GROUP BY doc_id`` over the
whole feed, but emits the running value after every micro-batch. State is
per doc_id (grouped state, Arrow-batched pandas — never per-row Python),
partitioned by the shuffle on the group key, so it scales horizontally
exactly like the dedup aggregation.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    pass

STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("max_seq", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("max_seq", T.LongType()),
    ]
)


def _update_doc_stats(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one doc_id into running state.
    Receives Arrow-batched pandas frames (vectorized; no per-row Python
    beyond the per-GROUP call)."""
    n_events = n_deletes = 0
    max_seq = None
    for pdf in pdfs:
        n_events += len(pdf)
        n_deletes += int((pdf["op"] == "D").sum())
        m = pdf["seq"].max()
        max_seq = m if max_seq is None else max(max_seq, m)
    if state.exists:
        pe, pd_, ps = state.get
        n_events += pe
        n_deletes += pd_
        max_seq = ps if max_seq is None else max(max_seq, ps)
    state.update((int(n_events), int(n_deletes), int(max_seq)))
    yield pd.DataFrame(
        {
            "doc_id": [key[0]],
            "n_events": [int(n_events)],
            "n_deletes": [int(n_deletes)],
            "max_seq": [int(max_seq)],
        }
    )


def doc_change_stats(changes: DataFrame) -> DataFrame:
    """T5/A4 as a first-class stateful streaming operator: per-doc running
    (event count, delete count, max seq) maintained across micro-batches in
    Spark-managed state (checkpointed with the query — restarts resume the
    counters). Works on a streaming DataFrame of change events
    (doc_id, seq, op, ...)."""
    from omicidx_etl_spark.session import ensure_worker_package

    ensure_worker_package(changes.sparkSession)
    return (
        changes.select("doc_id", "seq", "op")
        .groupBy("doc_id")
        .applyInPandasWithState(
            _update_doc_stats,
            outputStructType=STATS_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
