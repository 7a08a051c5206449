"""WARC (Web ARChive, ISO 28500) reader as a Spark 4 Python Data Source.

WARC is the wire format of web-scale text corpora (Common Crawl et al.), so
an engine aimed at training-data curation needs to scan it natively:

    spark.dataSource.register(WarcDataSource)
    df = spark.read.format("warc").load("/data/crawl/*.warc")
    # -> (warc_type, target_uri, warc_date, record_id, content_type,
    #     content_length, payload binary)

Design:
- One InputPartition per file (WARC records are length-delimited, so the
  file is the natural split unit; at 100 TB Common Crawl ships ~1 GB
  segment files by the hundred-thousand, which is exactly the
  one-file-one-task shape). The record parser is a streaming generator —
  constant memory per task regardless of file size.
- The parser is dependency-free stdlib: records are
  "WARC/1.0\\r\\n<headers>\\r\\n\\r\\n<Content-Length bytes>\\r\\n\\r\\n".
  Gzip members (the .warc.gz convention: one gzip member per record) are
  handled transparently per file.
- Payloads stay OPAQUE BINARY with typed metadata — the multimodal-column
  convention: decode downstream (pipeline/multimodal.py, pipeline/text.py),
  never in the scanner.
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
import os
from typing import Iterator

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType)

WARC_SCHEMA = StructType([
    StructField("warc_type", StringType()),
    StructField("target_uri", StringType()),
    StructField("warc_date", StringType()),
    StructField("record_id", StringType()),
    StructField("content_type", StringType()),
    StructField("content_length", LongType()),
    StructField("payload", BinaryType()),
])


def parse_warc_stream(stream) -> Iterator[dict]:
    """Stream WARC records off a binary file object: constant memory,
    tolerant of trailing garbage/blank lines between records."""
    while True:
        # seek the version line
        line = stream.readline()
        if not line:
            return
        if not line.strip():
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"not a WARC record boundary: {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if not h or h in (b"\r\n", b"\n"):
                break
            k, _, v = h.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        n = int(headers.get("content-length", "0"))
        payload = stream.read(n)
        yield {
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "record_id": headers.get("warc-record-id"),
            "content_type": headers.get("content-type"),
            "content_length": n,
            "payload": payload,
        }


def parse_warc_file(path: str) -> Iterator[dict]:
    """Open plain or per-record-gzipped (.gz) WARC and stream records."""
    if path.endswith(".gz"):
        # the .warc.gz convention concatenates one gzip member per record;
        # GzipFile transparently reads across members
        with gzip.open(path, "rb") as f:
            yield from parse_warc_stream(io.BufferedReader(f))
    else:
        with open(path, "rb") as f:
            yield from parse_warc_stream(f)


class _WarcPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _WarcReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source needs a load(path)")

    def partitions(self):
        paths = sorted(_glob.glob(self.path)) if any(
            c in self.path for c in "*?[") else None
        if paths is None:
            if os.path.isdir(self.path):
                paths = sorted(
                    os.path.join(self.path, p) for p in os.listdir(self.path)
                    if p.endswith((".warc", ".warc.gz")))
            else:
                paths = [self.path]
        if not paths:
            raise ValueError(f"no WARC files under {self.path}")
        return [_WarcPartition(p) for p in paths]

    def read(self, partition: _WarcPartition):
        for rec in parse_warc_file(partition.path):
            yield (rec["warc_type"], rec["target_uri"], rec["warc_date"],
                   rec["record_id"], rec["content_type"],
                   rec["content_length"], rec["payload"])


class _WarcStreamReader(SimpleDataSourceStreamReader):
    """Streaming tailer for a WARC landing directory: each micro-batch
    reads the records of every segment file that arrived since the last
    offset. The offset is the NAME of the last consumed file plus the
    count of listed files at-or-below that name — NOT a bare file count:
    "append-only" landing dirs don't guarantee lexicographically
    increasing names, and under a count offset a new file sorting before
    an already-consumed one shifts the index, re-emitting the current
    tail file and permanently skipping the newcomer (round-4 advice). A
    batch takes every file whose name sorts strictly above the watermark;
    a file that lands BELOW it (or a deletion under it) changes the
    below-watermark count and is raised as a hard error rather than
    silently skipped — exactly-once for foreachBatch pipelines
    (streaming/ingest.dedup_ingest_stream) must never lose records
    quietly."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc stream needs a load(path) directory")

    def _files(self):
        return sorted(
            os.path.join(self.path, p) for p in os.listdir(self.path)
            if p.endswith((".warc", ".warc.gz")))

    def initialOffset(self) -> dict:
        return {"last": "", "n_below": 0}

    def _rows(self, paths):
        # materialized (not a generator): Spark's prefetch cache
        # copy.copy()s the returned iterator for replay, which generators
        # don't support. A micro-batch is a handful of segment files —
        # bounded by arrival rate, not corpus size.
        return iter([
            (rec["warc_type"], rec["target_uri"], rec["warc_date"],
             rec["record_id"], rec["content_type"], rec["content_length"],
             rec["payload"])
            for p in paths for rec in parse_warc_file(p)])

    @staticmethod
    def _watermark(offset: dict) -> tuple[str, int]:
        if "last" not in offset:
            raise ValueError(
                "warc stream offset has no 'last' filename (legacy "
                "file-count offsets cannot name which files they covered "
                "once new arrivals re-sort the listing) — restart the "
                "stream with a fresh checkpoint")
        return offset["last"], offset.get("n_below", 0)

    def read(self, start: dict):
        last, n_below = self._watermark(start)
        files = self._files()
        below = [f for f in files if os.path.basename(f) <= last]
        if len(below) != n_below:
            raise ValueError(
                f"warc stream: {len(below)} files sort at-or-below the "
                f"committed watermark {last!r} but {n_below} were "
                f"consumed — a segment landed out of name order (or one "
                f"was deleted); the directory violates the append-only "
                f"delivery contract and the stream cannot attribute the "
                f"difference to any offset range")
        new = files[len(below):]
        end = {"last": os.path.basename(new[-1]) if new else last,
               "n_below": n_below + len(new)}
        return self._rows(new), end

    def readBetweenOffsets(self, start: dict, end: dict):
        lo, n_lo = self._watermark(start)
        hi, n_hi = self._watermark(end)
        files = [f for f in self._files()
                 if lo < os.path.basename(f) <= hi]
        if len(files) != n_hi - n_lo:
            raise ValueError(
                f"warc stream replay: offset range ({lo!r}, {hi!r}] "
                f"covered {n_hi - n_lo} files at commit time but "
                f"{len(files)} are listed now — the landing directory "
                f"changed under the checkpoint")
        return self._rows(files)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: the landing dir is append-only


class WarcDataSource(DataSource):
    """Batch: ``spark.read.format("warc").load(path_or_glob)``.
    Streaming: ``spark.readStream.format("warc").load(landing_dir)`` —
    tails the directory, one micro-batch per set of newly-arrived
    segment files (sorted-order offsets, exact replay)."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self):
        return WARC_SCHEMA

    def reader(self, schema):
        return _WarcReader(self.options)

    def simpleStreamReader(self, schema):
        return _WarcStreamReader(self.options)
