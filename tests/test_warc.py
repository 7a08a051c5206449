"""WARC Python Data Source: record parsing, gzip members, Spark scan with
one partition per file, and the curation handoff (payload -> documents)."""

import gzip

import pyspark.sql.functions as F
import pytest

from vivace_graph_v3_spark.sources.warc import (
    WarcDataSource, parse_warc_file)


def _record(uri: str, body: bytes, rtype: str = "response") -> bytes:
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: {rtype}\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
            f"WARC-Record-ID: <urn:uuid:{abs(hash(uri)) % 10**8}>\r\n"
            f"Content-Type: text/plain\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode()
    return head + body + b"\r\n\r\n"


def _write_warc(path, records, gz=False):
    if gz:
        # one gzip member per record — the .warc.gz convention
        with open(path, "wb") as f:
            for r in records:
                f.write(gzip.compress(r))
    else:
        with open(path, "wb") as f:
            for r in records:
                f.write(r)


def test_parse_warc_plain_and_gz(tmp_path):
    recs = [_record("http://a.example/1", b"hello world"),
            _record("http://a.example/2", b"x" * 100),
            _record("http://a.example/3", b"", rtype="warcinfo")]
    p1 = tmp_path / "a.warc"
    p2 = tmp_path / "a.warc.gz"
    _write_warc(str(p1), recs)
    _write_warc(str(p2), recs, gz=True)
    for p in (p1, p2):
        got = list(parse_warc_file(str(p)))
        assert [r["target_uri"] for r in got] == [
            "http://a.example/1", "http://a.example/2", "http://a.example/3"]
        assert got[0]["payload"] == b"hello world"
        assert got[1]["content_length"] == 100
        assert got[2]["warc_type"] == "warcinfo"


def test_warc_datasource_scan_and_partitioning(spark, tmp_path):
    for i in range(3):
        _write_warc(str(tmp_path / f"seg{i}.warc"),
                    [_record(f"http://s{i}.example/{j}",
                             f"doc {i}-{j} body words".encode())
                     for j in range(4)])
    spark.dataSource.register(WarcDataSource)
    df = spark.read.format("warc").load(str(tmp_path))
    assert df.count() == 12
    assert df.rdd.getNumPartitions() == 3  # one partition per file
    # glob load + filter pushStage works as a normal scan
    one = (spark.read.format("warc").load(str(tmp_path / "seg1.warc"))
           .filter(F.col("warc_type") == "response"))
    assert one.count() == 4
    # curation handoff: payload -> text -> the standard documents shape
    docs = (df.filter(F.col("warc_type") == "response")
            .select(F.col("record_id").alias("doc_id"),
                    F.col("payload").cast("string").alias("text"),
                    F.col("target_uri").alias("source")))
    from vivace_graph_v3_spark.pipeline.text import with_token_count
    toks = with_token_count(docs)
    assert toks.agg(F.sum("n_tokens")).first()[0] == 12 * 4


def test_warc_reader_rejects_garbage(tmp_path):
    p = tmp_path / "bad.warc"
    p.write_bytes(b"HTTP/1.1 200 OK\r\n\r\nnot a warc")
    with pytest.raises(Exception, match="not a WARC"):
        list(parse_warc_file(str(p)))


def test_warc_streaming_tails_new_segments(spark, tmp_path):
    """The streaming face: first availableNow run drains the existing
    segments; new files landing later are picked up (and ONLY them) by the
    next run against the same checkpoint — file-count offsets replay
    exactly."""
    land = tmp_path / "land"
    land.mkdir()
    cp = str(tmp_path / "cp")
    for i in range(2):
        _write_warc(str(land / f"seg{i}.warc"),
                    [_record(f"http://s{i}.example/{j}", b"body")
                     for j in range(3)])
    spark.dataSource.register(WarcDataSource)

    def drain(_table):
        got = []

        def sink(batch, _bid):
            got.extend(r.target_uri for r in batch.collect())

        q = (spark.readStream.format("warc").load(str(land))
             .writeStream.foreachBatch(sink)
             .option("checkpointLocation", cp)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return set(got)

    first = drain("warc_b1")
    assert len(first) == 6 and all("s0" in u or "s1" in u for u in first)

    _write_warc(str(land / "seg2.warc"),
                [_record(f"http://s2.example/{j}", b"body")
                 for j in range(2)])
    second = drain("warc_b2")
    assert len(second) == 2 and all("s2" in u for u in second)


def test_warc_to_curation_ingest_end_to_end(spark, tmp_path):
    """The full ingestion story: crawl segments land as WARC, the streaming
    scanner tails them, and the curation ingest near-dedups every
    micro-batch within itself AND against the ever-growing corpus index —
    only novel documents reach the corpus."""
    from vivace_graph_v3_spark.streaming.ingest import dedup_ingest_stream

    land = tmp_path / "land"
    land.mkdir()
    texts = {
        "u1": "alpha beta gamma delta epsilon zeta eta theta",
        "u2": "one two three four five six seven eight nine ten",
        "u2b": "one two three four five six seven eight nine ten",  # dup of u2
        "u3": "totally different content words here for the third doc",
    }
    _write_warc(str(land / "seg0.warc"),
                [_record(f"http://x.example/{k}", texts[k].encode())
                 for k in ("u1", "u2", "u2b")])
    spark.dataSource.register(WarcDataSource)

    docs = (spark.readStream.format("warc").load(str(land))
            .filter(F.col("warc_type") == "response")
            .select(F.col("target_uri").alias("doc_id"),
                    F.col("payload").cast("string").alias("text")))
    idx, corp = str(tmp_path / "idx"), str(tmp_path / "corp")
    q = dedup_ingest_stream(docs, idx, corp,
                            checkpoint=str(tmp_path / "cp"),
                            threshold=0.5)
    q.awaitTermination(180)
    kept1 = {r.doc_id for r in spark.read.parquet(corp).collect()}
    assert kept1 == {"http://x.example/u1", "http://x.example/u2"}

    # second segment arrives: one dup-of-corpus, one novel
    _write_warc(str(land / "seg1.warc"),
                [_record("http://y.example/copy", texts["u2"].encode()),
                 _record("http://y.example/new", texts["u3"].encode())])
    q = dedup_ingest_stream(docs, idx, corp,
                            checkpoint=str(tmp_path / "cp"),
                            threshold=0.5)
    q.awaitTermination(180)
    kept2 = {r.doc_id for r in spark.read.parquet(corp).collect()}
    assert kept2 == kept1 | {"http://y.example/new"}


def test_warc_stream_offset_survives_out_of_order_names(tmp_path):
    """Round-4 advice regression: the offset is a (last-name, below-count)
    watermark, not a file count. A newly-landed file whose name sorts
    BEFORE an already-consumed one must not shift the index (the count
    scheme re-emitted the current tail and permanently skipped the
    newcomer); it is detected and raised instead."""
    from vivace_graph_v3_spark.sources.warc import _WarcStreamReader

    land = tmp_path / "land"
    land.mkdir()
    for name in ("seg1.warc", "seg3.warc"):
        _write_warc(str(land / name),
                    [_record(f"http://{name}/x", b"body")])
    r = _WarcStreamReader({"path": str(land)})

    rows, off1 = r.read(r.initialOffset())
    assert {t[1] for t in rows} == {"http://seg1.warc/x",
                                    "http://seg3.warc/x"}
    assert off1 == {"last": "seg3.warc", "n_below": 2}

    # normal append above the watermark: only the new file is read
    _write_warc(str(land / "seg4.warc"), [_record("http://seg4.warc/x",
                                                  b"body")])
    rows, off2 = r.read(off1)
    assert [t[1] for t in rows] == ["http://seg4.warc/x"]
    assert off2 == {"last": "seg4.warc", "n_below": 3}

    # replay between offsets is exact
    replay = list(r.readBetweenOffsets(off1, off2))
    assert [t[1] for t in replay] == ["http://seg4.warc/x"]

    # a file landing BELOW the committed watermark is a contract
    # violation: raised, never silently skipped or double-read
    _write_warc(str(land / "seg2.warc"), [_record("http://seg2.warc/x",
                                                  b"body")])
    with pytest.raises(ValueError, match="append-only"):
        r.read(off2)
    # and replay of the old range detects the shifted listing too
    with pytest.raises(ValueError, match="changed under the checkpoint"):
        r.readBetweenOffsets(r.initialOffset(), off1)

    # legacy count-only offsets are refused, not misinterpreted
    with pytest.raises(ValueError, match="legacy"):
        r.read({"n_files": 2})
