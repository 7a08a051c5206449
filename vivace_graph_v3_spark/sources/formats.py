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
        # quote/escape pinned explicitly so the reader (below) is the
        # exact inverse — never rely on version-default symmetry
        (w.option("header", True).option("quoteAll", True)
         .option("quote", '"').option("escape", '"').csv(path))
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
        # multiLine (ADVICE r7): text containing an embedded newline is
        # written quoted; without multiLine the reader tears it into
        # malformed records and the coalesce below would silently mask
        # the damage as "". quote='"' escape='"' is RFC-4180 doubling,
        # the exact inverse of write_documents' options. multiLine makes
        # each FILE non-splittable — at scale parallelism comes from the
        # file count (write_documents' `partitions`), which is how any
        # newline-bearing CSV corpus must be sharded anyway.
        df = (spark.read.schema(DOCUMENTS_SCHEMA)
              .option("header", True).option("multiLine", True)
              .option("quote", '"').option("escape", '"').csv(path))
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
