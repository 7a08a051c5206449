"""Interchange-format connectors: read/write the engine's tables as JSONL,
CSV, or ORC in addition to parquet.

The reference ingests through its own heap serializer and exposes
backup/restore (backup.lisp); the Spark-first analog is format-agnostic
DataFrame I/O with a NORMALIZING read — whatever the wire format, the
frame that enters the engine has the canonical column names and types, so
every downstream operator (and every oracle) behaves identically. At
100 TB the reads stay distributed scans (Spark's json/csv sources split
files and push projection); JSONL/CSV are the interchange tier, parquet
remains the storage tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])


def write_documents(df: DataFrame, path: str, *, fmt: str = "jsonl",
                    partitions: int | None = None) -> None:
    """Export a documents frame as jsonl/csv/parquet. CSV is header-ed and
    quoted (text columns contain commas); JSONL is one object per line —
    the common corpus interchange shape."""
    if partitions:
        df = df.repartition(partitions)
    w = df.write.mode("overwrite")
    if fmt == "jsonl":
        w.json(path)
    elif fmt == "csv":
        w.option("header", True).option("quoteAll", True).csv(path)
    elif fmt == "parquet":
        w.parquet(path)
    elif fmt == "orc":
        w.orc(path)
    else:
        raise ValueError(f"unknown format: {fmt}")


def read_documents(spark: SparkSession, path: str, *,
                   fmt: str = "jsonl") -> DataFrame:
    """Normalizing read: whatever the wire format, the result has the
    canonical documents schema (names, types, column order). An explicit
    schema is passed to json/csv so malformed-type inference can never
    change engine semantics between ingests of the same data."""
    if fmt == "jsonl":
        df = spark.read.schema(DOCUMENTS_SCHEMA).json(path)
    elif fmt == "csv":
        df = (spark.read.schema(DOCUMENTS_SCHEMA)
              .option("header", True).csv(path))
    elif fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "orc":
        df = spark.read.orc(path)
    else:
        raise ValueError(f"unknown format: {fmt}")
    return df.select(
        F.col("doc_id").cast("long"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        F.col("lang").cast("string"),
        F.col("source").cast("string"),
        F.col("n_chars").cast("long"))
