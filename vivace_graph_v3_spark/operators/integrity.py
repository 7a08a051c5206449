"""Backup export + data-integrity validation jobs.

Reference semantics reproduced (citations into /root/reference):

- ``backup`` (backup.lisp:3-44): export every node (vertices first, then
  edges, so a restore can resolve endpoints) to a portable text format —
  here NDJSON or parquet, partitioned by type.
- ``check-data-integrity`` (backup.lisp:46-80): full-scan invariant checks;
  the reference walks every edge and verifies both endpoints exist and are
  live, and that node heads/revisions are consistent. Re-expressed as
  distributed anti-joins / aggregations that return *violation rows* instead
  of logging — empty result = clean store.

Checks implemented (each a single shuffle-light DataFrame job):

  dangling_edges      edge endpoints that don't exist at all
  half_dead_edges     active (non-deleted) edges with a deleted endpoint
                      (violates active-edge-p consistency, edge.lisp:275-284)
  duplicate_ids       same id appearing more than once within a type table
  negative_revisions  revision < 0 or commit_epoch < 0
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from vivace_graph_v3_spark.graph import GraphStore


def backup(graph: GraphStore, out_path: str, *, fmt: str = "json",
           include_deleted: bool = True) -> None:
    """Export all vertex then edge tables under ``out_path/<kind>_<type>``
    (backup.lisp:3-44). ``fmt``: 'json' (NDJSON lines) or 'parquet'."""
    for kind, names, scan in (
            ("vertex", graph.vertex_types(),
             lambda t: graph.scan_vertices(t, include_deleted=include_deleted,
                                           include_subclasses=False)),
            ("edge", graph.edge_types(),
             lambda t: graph.scan_edges(t, include_deleted=include_deleted))):
        for t in names:
            df = scan(t)
            writer = df.write.mode("overwrite")
            if fmt == "json":
                writer.json(f"{out_path}/{kind}_{t}")
            else:
                writer.parquet(f"{out_path}/{kind}_{t}")


def restore(graph_cls, spark, registry, backup_path: str, *,
            fmt: str = "json") -> GraphStore:
    """Rebuild a GraphStore from a backup directory."""
    import os

    g = GraphStore(spark, registry, name=f"restore:{backup_path}")
    for d in sorted(os.listdir(backup_path)):
        kind, _, type_name = d.partition("_")
        reader = spark.read
        nt = registry.get(type_name)
        df = (reader.schema(nt.struct_type()).json(f"{backup_path}/{d}")
              if fmt == "json" else reader.parquet(f"{backup_path}/{d}"))
        if kind == "vertex":
            g.add_vertices(type_name, df)
        else:
            g.add_edges(type_name, df)
    return g


def check_data_integrity(graph: GraphStore) -> dict[str, DataFrame]:
    """All invariant scans (backup.lisp:46-80); each value is a DataFrame of
    violations (empty = invariant holds). Lazily composed — callers run
    ``.isEmpty()`` / ``.count()`` per check or union them into one report."""
    vertices = graph.scan_vertices(include_deleted=True,
                                   columns=["id", "deleted"])
    edges = graph.scan_edges(include_deleted=True,
                             columns=["id", "type", "src", "dst", "deleted"])
    vid = vertices.select("id")

    dangling = (edges
                .join(vid.withColumnRenamed("id", "src"), "src", "left_anti")
                .unionByName(
                    edges.join(vid.withColumnRenamed("id", "dst"),
                               "dst", "left_anti")))

    dead = vertices.filter(F.col("deleted")).select("id")
    live_edges = edges.filter(~F.col("deleted"))
    half_dead = (live_edges
                 .join(dead.withColumnRenamed("id", "src"), "src", "left_semi")
                 .unionByName(
                     live_edges.join(dead.withColumnRenamed("id", "dst"),
                                     "dst", "left_semi")))

    def dupes(tables):
        frames = [tables[t].groupBy("id").count().filter(F.col("count") > 1)
                  .withColumn("type", F.lit(t)) for t in tables]
        return reduce(DataFrame.unionByName, frames) if frames else None

    duplicate_ids = dupes({t: graph._vertices[t] for t in graph.vertex_types()})
    edge_dupes = dupes({t: graph._edges[t] for t in graph.edge_types()})
    if duplicate_ids is not None and edge_dupes is not None:
        duplicate_ids = duplicate_ids.unionByName(edge_dupes)
    elif duplicate_ids is None:
        duplicate_ids = edge_dupes

    all_nodes = vertices.select("id").unionByName(edges.select("id"))
    negative = (graph.scan_vertices(include_deleted=True,
                                    columns=["id", "revision", "commit_epoch"])
                .unionByName(graph.scan_edges(
                    include_deleted=True,
                    columns=["id", "revision", "commit_epoch"]))
                .filter((F.col("revision") < 0) | (F.col("commit_epoch") < 0)))
    _ = all_nodes

    return {
        "dangling_edges": dangling,
        "half_dead_edges": half_dead,
        "duplicate_ids": duplicate_ids,
        "negative_revisions": negative,
    }


def integrity_report(graph: GraphStore) -> DataFrame:
    """One-row-per-check summary (check name, violation count)."""
    checks = check_data_integrity(graph)
    spark = graph.spark
    rows = [(name, df.count()) for name, df in checks.items()]
    return spark.createDataFrame(rows, "check string, violations long")


def fk_integrity_audit(pairs: list[tuple[str, DataFrame, str, DataFrame, str]]
                       ) -> DataFrame:
    """Relational foreign-key audit — the referential-integrity
    complement of the graph-side check_data_integrity (backup.lisp:46-80
    validates vertex/edge structural invariants; this validates the
    RELATIONAL projection): for each (name, child, child_col, parent,
    parent_col) pair, count child rows whose key has no parent (orphans)
    and child rows with NULL keys.

    Returns (fk, n_child, n_null_keys, n_orphans). Scale shape: one
    left-anti join per pair — Catalyst broadcasts the parent when small
    (dimension FKs) and falls back to a shuffle semi-join otherwise; the
    counts are map-side-combined. Run it before export: shard manifests
    assume closed FKs."""
    outs = []
    for name, child, ccol, parent, pcol in pairs:
        keys = child.select(F.col(ccol).alias("k"))
        nn = keys.filter(F.col("k").isNull())
        orphans = (keys.filter(F.col("k").isNotNull())
                   .join(parent.select(F.col(pcol).alias("k")).distinct(),
                         "k", "left_anti"))
        outs.append(
            keys.agg(F.count(F.lit(1)).alias("n_child"))
            .crossJoin(nn.agg(F.count(F.lit(1)).alias("n_null_keys")))
            .crossJoin(orphans.agg(F.count(F.lit(1)).alias("n_orphans")))
            .select(F.lit(name).alias("fk"),
                    F.col("n_child").cast("long").alias("n_child"),
                    F.col("n_null_keys").cast("long").alias("n_null_keys"),
                    F.col("n_orphans").cast("long").alias("n_orphans")))
    return reduce(lambda a, b: a.unionAll(b), outs)


def replica_checksum_manifest(df, key_col: str, cols: list[str],
                              *, n_buckets: int = 64):
    """Order-free per-bucket checksum manifest for replica verification
    (the logical-layer companion of the reference's
    ``check-data-integrity`` heap walk and its replication stream,
    vivace-graph-v3.lisp:283-331 / transactions.lisp:884-956): each row
    hashes its canonical column rendering through the cross-engine
    md5-64, buckets by ``key mod n_buckets``, and the bucket checksum is
    the BIT-XOR fold — commutative and associative, so ANY engine, any
    partitioning, any row order produces the identical manifest. Two
    replicas diverge iff some bucket row disagrees; comparing manifests
    is n_buckets rows instead of a full-table diff.

    Scale shape: one map-side-combined aggregate; output is n_buckets
    rows regardless of volume."""
    from pyspark.sql import functions as F

    from vivace_graph_v3_spark.pipeline.dedup import md5_hash64

    rendered = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    h = md5_hash64(rendered)
    return (df.select(F.pmod(F.col(key_col), F.lit(n_buckets))
                      .cast("long").alias("bucket"), h.alias("h"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.bit_xor("h").alias("checksum"))
            .select("bucket", F.col("n_rows").cast("long").alias("n_rows"),
                    F.col("checksum").cast("long").alias("checksum")))
