"""Property-based check of the CDC core invariant (hypothesis): for
ARBITRARY event logs — any op mix (delete-before-insert, all-deletes,
re-insert after delete), any seq permutation, any token arrays including
empty, any micro-batch chunking, either storage mode — the final table
state equals the latest-per-key ∧ not-deleted oracle, row-for-row on the
token arrays (the north rule's per-row invariant).

The registry/oracle gate proves fixed scenarios; this proves the
*invariant* over the input space, with hypothesis shrinking any
counterexample to a minimal log.
"""

from __future__ import annotations

import shutil
import tempfile

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from omicidx_etl_spark.cdc.replay import replay_log
from omicidx_etl_spark.lake import LakeTable


EVENT = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.integers(min_value=0, max_value=6),  # small doc pool → collisions
    st.lists(st.integers(min_value=0, max_value=1000), max_size=5),
)


def _log_df(spark, events):
    """events: list[(op, doc, tokens)]; seq = position+1 (a WAL offset)."""
    rows = [
        (
            i + 1,
            op,
            f"doc{doc}",
            None if op == "D" else tokens,
            None if op == "D" else len(tokens),
            None if op == "D" else f"src{doc % 2}",
        )
        for i, (op, doc, tokens) in enumerate(events)
    ]
    return spark.createDataFrame(
        rows,
        "seq long, op string, doc_id string, tokens array<int>, "
        "n_tok int, source string",
    )


def _oracle(pdf: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("log", pdf)
    out = con.execute(
        """
        SELECT doc_id, tokens, n_tok, source FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) rn
          FROM log) WHERE rn = 1 AND op <> 'D'
        """
    ).df()
    con.close()
    return out


def _norm(df: pd.DataFrame) -> list[tuple]:
    return sorted(
        (
            r.doc_id,
            tuple(r.tokens) if r.tokens is not None else None,
            r.n_tok,
            r.source,
        )
        for r in df.itertuples()
    )


@pytest.mark.parametrize("mode", ["mor", "cow"])
@given(
    events=st.lists(EVENT, max_size=40),
    n_chunks=st.integers(min_value=1, max_value=4),
    compact_after=st.booleans(),
)
@settings(
    max_examples=8,  # ~3 s/example (create+replay+compact+read); CI-sized
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_replay_matches_oracle_for_arbitrary_logs(
    spark, mode, events, n_chunks, compact_after
):
    d = tempfile.mkdtemp(prefix="prop_replay_")
    try:
        log = _log_df(spark, events)
        log.write.mode("overwrite").parquet(f"{d}/log")
        t = LakeTable.create(
            spark,
            f"{d}/table",
            schema=T.StructType.fromDDL(
                "doc_id string, tokens array<int>, n_tok int, source string"
            ),
            key="doc_id",
            n_buckets=4,
        )
        chunk = max(1, -(-max(len(events), 1) // n_chunks))  # ceil-div
        replay_log(spark, t, f"{d}/log", chunk_events=chunk, app_id="prop",
                   mode=mode)
        if compact_after:
            t.compact()
        got = _norm(t.read().toPandas())
        exp = _norm(_oracle(log.toPandas()))
        assert got == exp
    finally:
        shutil.rmtree(d, ignore_errors=True)
