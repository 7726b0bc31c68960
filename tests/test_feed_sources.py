"""Feed sources (SURVEY §2.1 S4/S5/S16 + §2.10 D1): XML feed parsing
(batch + streaming), cursor/offset REST pagination with retry, and the
byte-range file server contract."""

from __future__ import annotations

import gzip
import json
import threading
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from omicidx_etl_spark import sources as S

# --------------------------------------------------------------- XML feed

SRA_FIELDS = {
    "accession": "@accession",
    "title": "TITLE",
    "primary_id": "IDENTIFIERS/PRIMARY_ID",
    "instrument": "PLATFORM//INSTRUMENT_MODEL",
    "layout_length": "DESIGN/LIBRARY_LAYOUT@NOMINAL_LENGTH",
}


def _experiment_xml(accessions: list[str]) -> bytes:
    recs = "".join(
        f"""
  <EXPERIMENT accession="{a}">
    <IDENTIFIERS><PRIMARY_ID>{a}</PRIMARY_ID></IDENTIFIERS>
    <TITLE>  Experiment {a} </TITLE>
    <DESIGN><LIBRARY_LAYOUT NOMINAL_LENGTH="{100 + len(a)}"/></DESIGN>
    <PLATFORM><ILLUMINA><INSTRUMENT_MODEL>NovaSeq</INSTRUMENT_MODEL></ILLUMINA></PLATFORM>
  </EXPERIMENT>"""
        for a in accessions
    )
    return f"<EXPERIMENT_SET>{recs}\n</EXPERIMENT_SET>".encode()


@pytest.fixture()
def xml_feed_dir(tmp_path):
    d = tmp_path / "feed"
    d.mkdir()
    (d / "batch1.xml.gz").write_bytes(gzip.compress(_experiment_xml(["SRX1", "SRX2"])))
    (d / "batch2.xml").write_bytes(_experiment_xml(["SRX3"]))
    return str(d)


def test_read_xml_feed_batch(spark, xml_feed_dir):
    df = S.read_xml_feed(spark, xml_feed_dir, "EXPERIMENT", SRA_FIELDS)
    rows = {r.accession: r for r in df.collect()}
    assert set(rows) == {"SRX1", "SRX2", "SRX3"}
    assert rows["SRX1"].title == "Experiment SRX1"  # trimmed
    assert rows["SRX2"].primary_id == "SRX2"
    assert rows["SRX3"].instrument == "NovaSeq"  # deep (//) path
    assert rows["SRX1"].layout_length == "104"  # nested attribute
    assert rows["SRX3"]._source_file.endswith("batch2.xml")
    assert all(r._error is None for r in rows.values())


def test_parse_xml_malformed_file_quarantined(spark, tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    (d / "good.xml").write_bytes(_experiment_xml(["SRX9"]))
    (d / "broken.xml").write_bytes(b"<EXPERIMENT_SET><EXPERIMENT")  # truncated
    df = S.read_xml_feed(spark, str(d), "EXPERIMENT", SRA_FIELDS)
    rows = df.collect()
    good = [r for r in rows if r._error is None]
    bad = [r for r in rows if r._error is not None]
    assert [r.accession for r in good] == ["SRX9"]
    assert len(bad) == 1 and bad[0].accession is None
    assert bad[0]._source_file.endswith("broken.xml")
    assert "ParseError" in bad[0]._error


def test_stream_xml_feed_microbatches(spark, xml_feed_dir, tmp_path):
    stream = S.stream_xml_feed(
        spark, xml_feed_dir, "EXPERIMENT", SRA_FIELDS, max_files_per_trigger=1
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("xmlfeed")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.accession for r in spark.sql("select * from xmlfeed").collect()}
    assert got == {"SRX1", "SRX2", "SRX3"}
    # back-pressure: one file per micro-batch
    assert len(q.recentProgress) >= 2


# --------------------------------------------------------------- REST feed


def test_with_retry_eventual_success():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        return "ok"

    assert S.with_retry(flaky, attempts=5, base_delay=0)() == "ok"
    assert calls["n"] == 3


def test_with_retry_exhausts():
    def always_down():
        raise OSError("down")

    with pytest.raises(OSError):
        S.with_retry(always_down, attempts=3, base_delay=0)()


def _fake_pages(n_pages: int, per_page: int):
    """Cursor-chained fake API: page i links to page i+1."""

    def fetch(cursor):
        i = int(cursor or 0)
        if i >= n_pages:
            return {"records": []}
        recs = [
            {"id": i * per_page + j, "val": f"v{i}-{j}"} for j in range(per_page)
        ]
        out = {"records": recs}
        if i + 1 < n_pages:
            out["next"] = str(i + 1)
        return out

    return fetch


def test_iter_cursor_pages_follows_chain():
    pages = list(S.iter_cursor_pages(_fake_pages(3, 4), base_delay=0))
    assert [len(p) for p in pages] == [4, 4, 4]
    assert pages[2][0]["id"] == 8


def test_iter_cursor_pages_retries_transient():
    inner = _fake_pages(2, 2)
    state = {"fail": 2}

    def flaky(cursor):
        if state["fail"] > 0:
            state["fail"] -= 1
            raise OSError("503")
        return inner(cursor)

    pages = list(S.iter_cursor_pages(flaky, base_delay=0))
    assert [len(p) for p in pages] == [2, 2]


def test_land_cursor_feed_stages_and_reads(spark, tmp_path):
    df = S.land_cursor_feed(
        spark,
        _fake_pages(5, 100),
        staging_dir=str(tmp_path / "stage"),
        records_per_part=150,
        base_delay=0,
    )
    assert df.count() == 500
    assert df.filter("id = 499").count() == 1
    parts = list((tmp_path / "stage").glob("part-*.ndjson.gz"))
    assert len(parts) >= 3  # bounded driver memory → multiple spill parts


class _PagesHandler(BaseHTTPRequestHandler):
    total = 23

    def do_GET(self):  # noqa: N802
        from urllib.parse import parse_qs, urlsplit

        q = parse_qs(urlsplit(self.path).query)
        off, lim = int(q["offset"][0]), int(q["limit"][0])
        recs = [
            {"id": i, "name": f"acc{i}"} for i in range(off, min(off + lim, self.total))
        ]
        body = json.dumps({"records": recs}).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):
        pass


def test_fetch_offset_feed_distributed(spark):
    from pyspark.sql import types as T

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _PagesHandler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{port}/pages"

        def fetch_page(offset: int, limit: int):
            with urllib.request.urlopen(f"{url}?offset={offset}&limit={limit}") as r:
                return json.loads(r.read())["records"]

        schema = T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
        )
        df = S.fetch_offset_feed(
            spark, fetch_page, total=23, page_size=5, schema=schema, base_delay=0
        )
        rows = df.collect()
        assert sorted(r.id for r in rows) == list(range(23))
        assert {r.name for r in rows} == {f"acc{i}" for i in range(23)}
    finally:
        httpd.shutdown()
        httpd.server_close()


# ------------------------------------------------------------ range server


@pytest.fixture()
def served_dir(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    (d / "table.parquet").write_bytes(b"PAR1" + bytes(range(256)) * 40 + b"PAR1")
    (d / "sub").mkdir()
    (d / "sub" / "x.csv").write_text("a,b\n1,2\n")
    srv = S.RangeFileServer(str(d))
    url = srv.start()
    yield url, d
    srv.stop()


def _get(url: str, headers: dict | None = None):
    req = urllib.request.Request(url, headers=headers or {})
    with urllib.request.urlopen(req) as r:
        return r.status, dict(r.headers), r.read()


def test_range_server_full_get(served_dir):
    url, d = served_dir
    status, headers, body = _get(url + "table.parquet")
    assert status == 200
    assert body == (d / "table.parquet").read_bytes()
    assert headers["Accept-Ranges"] == "bytes"
    assert headers["Content-Type"] == "application/vnd.apache.parquet"


def test_range_server_bounded_and_suffix_ranges(served_dir):
    url, d = served_dir
    raw = (d / "table.parquet").read_bytes()
    status, headers, body = _get(
        url + "table.parquet", {"Range": "bytes=4-19"}
    )
    assert status == 206
    assert body == raw[4:20]
    assert headers["Content-Range"] == f"bytes 4-19/{len(raw)}"
    # open-ended range → to EOF (worker/src/index.ts:27 semantics)
    status, _, tail = _get(url + "table.parquet", {"Range": f"bytes={len(raw)-4}-"})
    assert status == 206 and tail == b"PAR1"  # parquet footer magic
    # true suffix range (bytes=-N): what parquet footer readers issue
    status, headers, tail = _get(url + "table.parquet", {"Range": "bytes=-4"})
    assert status == 206 and tail == b"PAR1"
    assert headers["Content-Range"] == f"bytes {len(raw)-4}-{len(raw)-1}/{len(raw)}"


def test_range_server_invalid_range_degrades_to_full(served_dir):
    url, d = served_dir
    status, _, body = _get(url + "table.parquet", {"Range": "bytes=zzz"})
    assert status == 200 and body == (d / "table.parquet").read_bytes()


def test_range_server_head_and_404_and_listing(served_dir):
    url, d = served_dir
    req = urllib.request.Request(url + "table.parquet", method="HEAD")
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        assert int(r.headers["Content-Length"]) == (d / "table.parquet").stat().st_size
        assert r.read() == b""
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(url + "missing.parquet")
    assert exc.value.code == 404
    status, _, body = _get(url)
    assert status == 200 and b"table.parquet" in body and b"sub/" in body
    status, _, body = _get(url + "sub/")
    assert status == 200 and b"x.csv" in body
    # bare directory path (no trailing slash): hrefs must still carry the
    # separator — '/sub/x.csv', never the broken '/subx.csv'
    status, _, body = _get(url + "sub")
    assert status == 200 and b'href="/sub/x.csv"' in body


def test_stream_xml_feed_into_lake_exactly_once(spark, tmp_path):
    """End-to-end S4→engine: streaming XML feed → staging cast → versioned
    merge into a LakeTable inside foreachBatch, with the (app_id, batch_id)
    watermark giving exactly-once across a full re-run without checkpoint."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from omicidx_etl_spark.cdc import dedup_latest
    from omicidx_etl_spark.lake import LakeTable

    feed = tmp_path / "feed"
    feed.mkdir()

    def _doc_xml(docs):
        recs = "".join(
            f'<DOC seq="{s}" op="{op}"><ID>{d}</ID><TOKENS>{toks}</TOKENS></DOC>'
            for s, op, d, toks in docs
        )
        return f"<DOCSET>{recs}</DOCSET>".encode()

    (feed / "f1.xml.gz").write_bytes(
        gzip.compress(_doc_xml([(1, "U", "d1", "1 2 3"), (2, "U", "d2", "4 5")]))
    )
    (feed / "f2.xml").write_bytes(
        _doc_xml([(3, "U", "d1", "7 8"), (4, "D", "d2", "")])
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, str(tmp_path / "t"), schema, key="doc_id", n_buckets=2
    )

    fields = {"doc_id": "ID", "seq": "@seq", "op": "@op", "raw_tokens": "TOKENS"}

    def run(ckpt: str):
        stream = S.stream_xml_feed(
            spark, str(feed), "DOC", fields, max_files_per_trigger=1
        )
        staged = stream.select(
            F.col("doc_id"),
            F.col("seq").cast("long").alias("seq"),
            F.col("op"),
            F.split(F.trim("raw_tokens"), r"\s+").cast("array<int>").alias("tokens"),
            F.lit("xml_feed").alias("source"),
        ).withColumn("n_tok", F.size("tokens").cast("int"))

        def apply_batch(df, batch_id):
            table.merge(
                dedup_latest(df), app_id="xmlfeed", batch_id=batch_id, mode="mor"
            )

        q = (
            staged.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run(str(tmp_path / "ckpt1"))
    rows = {r["doc_id"]: r for r in table.read().collect()}
    assert set(rows) == {"d1"}  # d2 deleted by seq-4 tombstone
    assert rows["d1"]["tokens"] == [7, 8]  # seq-3 supersedes seq-1
    sid = table.snapshot()["snapshot_id"]

    # full re-delivery without checkpoint: batch watermark skips both batches
    run(str(tmp_path / "ckpt2"))
    assert table.snapshot()["snapshot_id"] == sid
    assert {r["doc_id"] for r in table.read().collect()} == {"d1"}


def test_range_server_blocks_traversal(served_dir):
    url, _ = served_dir
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(url + "..%2f..%2fetc%2fpasswd")
    assert exc.value.code == 404


def test_land_cursor_feed_empty_feed(spark, tmp_path):
    from pyspark.sql import types as T

    def empty(cursor):
        return {"records": []}

    schema = T.StructType([T.StructField("id", T.LongType())])
    df = S.land_cursor_feed(
        spark, empty, staging_dir=str(tmp_path / "s1"), schema=schema, base_delay=0
    )
    assert df.count() == 0 and df.schema == schema
    with pytest.raises(ValueError, match="schema"):
        S.land_cursor_feed(spark, empty, staging_dir=str(tmp_path / "s2"), base_delay=0)
