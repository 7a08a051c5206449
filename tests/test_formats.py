"""Interchange-format connectors: a documents table round-trips through
JSONL and CSV bit-for-bit (after the normalizing read), so any operator —
and any oracle — sees identical frames regardless of wire format."""

import pyspark.sql.functions as F

from vivace_graph_v3_spark.sources.formats import (
    read_documents, write_documents)

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(
        tuple(r) for r in
        df.select("doc_id", "text", "lang", "source", "n_chars").collect())


def test_documents_roundtrip_jsonl_and_csv(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    want = _canon(docs)
    for fmt in ("jsonl", "csv", "orc"):
        path = str(tmp_path / fmt)
        write_documents(docs, path, fmt=fmt, partitions=3)
        got = read_documents(spark, path, fmt=fmt)
        assert [f.name for f in got.schema.fields] == \
            ["doc_id", "text", "lang", "source", "n_chars"]
        assert _canon(got) == want, fmt


def test_normalizing_read_coalesces_missing_text(spark, tmp_path):
    # JSONL with a null text field: the normalizing read turns it into ''
    p = tmp_path / "in"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"doc_id": 1, "lang": "en", "source": "s", "n_chars": 0}\n'
        '{"doc_id": 2, "text": "hi", "lang": "en", "source": "s", '
        '"n_chars": 2}\n')
    got = {r.doc_id: r.text
           for r in read_documents(spark, str(p), fmt="jsonl").collect()}
    assert got == {1: "", 2: "hi"}
