"""GraphStore: a property graph as a namespace of typed DataFrames.

The reference's ``graph`` class is a directory of mmap'd tables + indexes
(graph-class.lisp:13-49, graph.lisp:27-149). Spark-first, a graph is a set of
per-type vertex/edge DataFrames; the reference's physical indexes become scan
and join strategies (SURVEY.md §1.5):

- vertex-table/edge-table (point lookup, linear-hash.lisp:245)  -> id filter
  (parquet min/max + dictionary pushdown)
- type-index (type scans, type-index.lisp:1-40)                 -> per-type
  DataFrames: a type scan touches only its own files (partition pruning by
  construction)
- VE / VEV adjacency indexes (ve-index.lisp, vev-index.lisp)    -> equi-joins
  / filters on (src, dst, type); Catalyst picks broadcast/hash/SMJ
- views (skip lists)                                            -> materialized
  DataFrames (views.py)

Deletion semantics (must match the reference — SURVEY.md §7.3):

- soft delete flag skipped by scans unless asked (vertex.lisp:157-222)
- an edge is *active* only if it and BOTH endpoints are non-deleted
  (``active-edge-p`` edge.lisp:275-284): :meth:`GraphStore.active_edges`
  implements this as two semi-joins, elided when the store is tombstone-free.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

from vivace_graph_v3_spark.schema import SYSTEM_COLUMNS, SchemaRegistry


class GraphStore:
    """A named graph: per-type vertex and edge DataFrames + a schema registry.

    ``has_tombstones=False`` declares that no row has deleted=True (true for
    freshly projected datasets); active-edge semi-joins are then elided so the
    plan doesn't pay two shuffles for a no-op filter. Mutation APIs (mvcc.py)
    flip it back on.
    """

    def __init__(self, spark: SparkSession, registry: SchemaRegistry,
                 name: str = "graph", has_tombstones: bool = True) -> None:
        self.spark = spark
        self.registry = registry
        self.name = name
        self.has_tombstones = has_tombstones
        self._vertices: dict[str, DataFrame] = {}
        self._edges: dict[str, DataFrame] = {}
        self._edge_endpoints: dict[str, tuple[str | None, str | None]] = {}

    # -- registration -------------------------------------------------------

    def add_vertices(self, type_name: str, df: DataFrame) -> None:
        self.registry.get(type_name)
        self._vertices[type_name] = df

    def add_edges(self, type_name: str, df: DataFrame, *,
                  src_type: str | None = None,
                  dst_type: str | None = None) -> None:
        """Register an edge table. ``src_type``/``dst_type`` optionally
        declare the endpoint VERTEX types of every edge in the table (a
        homogeneous arm, like a foreign key). Declaring them asserts the
        engine's ``"<type>:<key>"`` vertex-id convention for this arm and
        lets traversals prune whole arms whose from-side type cannot occur
        in the current frontier — entire source scans are skipped, the
        graph analog of partition pruning. Leave None for heterogeneous or
        untyped arms; they are then always scanned."""
        self.registry.get(type_name)
        self._edges[type_name] = df
        self._edge_endpoints[type_name] = (src_type, dst_type)

    def edge_endpoints(self, type_name: str) -> tuple[str | None, str | None]:
        return self._edge_endpoints.get(type_name, (None, None))

    def vertex_types(self) -> list[str]:
        return sorted(self._vertices)

    def edge_types(self) -> list[str]:
        return sorted(self._edges)

    # -- scans (map-vertices / map-edges access paths) -----------------------

    def scan_vertices(self, type_name: str | None = None, *,
                      include_deleted: bool = False,
                      include_subclasses: bool = True,
                      columns: list[str] | None = None) -> DataFrame:
        """``map-vertices`` (vertex.lisp:157-222): all / by type / by type+subs.

        Returns the union of the relevant per-type tables projected onto
        ``columns`` (missing slots -> NULL), so column pruning reaches every
        parquet scan.
        """
        if type_name is None:
            names = self.vertex_types()
        elif include_subclasses:
            names = [t for t in self.registry.subtype_closure(type_name)
                     if t in self._vertices]
        else:
            names = [type_name] if type_name in self._vertices else []
        if not names:
            raise KeyError(f"no vertex tables for type {type_name!r}")
        return self._union(self._vertices, names, include_deleted, columns)

    def scan_edges(self, type_name: str | list[str] | None = None, *,
                   include_deleted: bool = False,
                   columns: list[str] | None = None) -> DataFrame:
        """Raw edge scan by type (type-index path of map-edges,
        edge.lisp:305-441); endpoint liveness is :meth:`active_edges`.
        ``type_name`` may be a list to scan an arm subset in one union."""
        if isinstance(type_name, (list, tuple)):
            names = list(type_name)
        else:
            names = [type_name] if type_name else self.edge_types()
        missing = [n for n in names if n not in self._edges]
        if missing:
            raise KeyError(f"no edge tables for types {missing}")
        return self._union(self._edges, names, include_deleted, columns)

    def active_edges(self, type_name: str | list[str] | None = None, *,
                     columns: list[str] | None = None) -> DataFrame:
        """Edges passing ``active-edge-p`` (edge.lisp:275-284): the edge and
        both endpoints are live. Implemented as two semi-joins against the
        live vertex id set; skipped entirely when tombstone-free."""
        edges = self.scan_edges(type_name, columns=columns)
        if not self.has_tombstones:
            return edges
        live = self.scan_vertices(columns=["id"]).select("id")
        return (edges
                .join(live.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(live.withColumnRenamed("id", "dst"), "dst", "left_semi"))

    def lookup_vertex(self, node_id: str, *, include_deleted: bool = True) -> DataFrame:
        """Point lookup by id; returns even if deleted (vertex.lisp:84-91)."""
        return self.scan_vertices(include_deleted=include_deleted).filter(
            F.col("id") == node_id)

    def lookup_edge(self, edge_id: str, *, include_deleted: bool = True) -> DataFrame:
        return self.scan_edges(include_deleted=include_deleted).filter(
            F.col("id") == edge_id)

    def edge_exists(self, src_id: str, dst_id: str, type_name: str) -> bool:
        """``edge-exists-p`` VEV probe (edge.lisp:286-303)."""
        df = self.active_edges(type_name).filter(
            (F.col("src") == src_id) & (F.col("dst") == dst_id))
        return not df.isEmpty()

    # -- helpers -------------------------------------------------------------

    def _union(self, tables: dict[str, DataFrame], names: list[str],
               include_deleted: bool, columns: list[str] | None) -> DataFrame:
        if columns is not None:
            cols = list(dict.fromkeys(columns))  # preserve order, dedupe
        else:
            cols = None
        parts = []
        for n in names:
            df = tables[n]
            if not include_deleted and self.has_tombstones:
                df = df.filter(~F.col("deleted"))
            if cols is not None:
                avail = set(df.columns)
                df = df.select(*[
                    F.col(c) if c in avail else F.lit(None).alias(c) for c in cols
                ])
            parts.append(df)
        if cols is None:
            # Align heterogeneous slot sets on the full union of columns.
            all_cols = list(dict.fromkeys(c for p in parts for c in p.columns))
            parts = [p.select(*[
                F.col(c) if c in p.columns else F.lit(None).alias(c) for c in all_cols
            ]) for p in parts]
        return reduce(DataFrame.unionByName, parts)

    def slot_columns(self, type_name: str) -> list[str]:
        return [c for c in self.registry.get(type_name).slots if c not in SYSTEM_COLUMNS]


# ---------------------------------------------------------------------------
# TPC-H testdata -> graph projection (FIXTURES.md F6)
# ---------------------------------------------------------------------------

def _sys_cols(df: DataFrame, type_name: str, key_col) -> DataFrame:
    return (df
            .withColumn("id", F.concat(F.lit(type_name + ":"), key_col.cast("string")))
            .withColumn("type", F.lit(type_name))
            .withColumn("deleted", F.lit(False))
            .withColumn("revision", F.lit(0).cast("long"))
            .withColumn("commit_epoch", F.lit(0).cast("long")))


def _edge(df: DataFrame, type_name: str, eid, src, dst, weight=None) -> DataFrame:
    return (df.select(
        F.concat(F.lit(type_name + ":"), eid.cast("string")).alias("id"),
        F.lit(type_name).alias("type"),
        F.lit(False).alias("deleted"),
        F.lit(0).cast("long").alias("revision"),
        F.lit(0).cast("long").alias("commit_epoch"),
        src.alias("src"),
        dst.alias("dst"),
        (weight if weight is not None else F.lit(1.0)).cast("double").alias("weight"),
    ))


TPCH_VERTEX_SLOTS = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority"],
}

TPCH_KEYS = {
    "region": "r_regionkey", "nation": "n_nationkey", "customer": "c_custkey",
    "supplier": "s_suppkey", "part": "p_partkey", "orders": "o_orderkey",
}


def build_tpch_registry() -> SchemaRegistry:
    from pyspark.sql import types as T

    reg = SchemaRegistry()
    type_map = {
        "r_regionkey": T.IntegerType(), "r_name": T.StringType(),
        "n_nationkey": T.IntegerType(), "n_name": T.StringType(),
        "n_regionkey": T.IntegerType(),
        "c_custkey": T.LongType(), "c_name": T.StringType(),
        "c_nationkey": T.IntegerType(), "c_acctbal": T.DoubleType(),
        "c_mktsegment": T.StringType(),
        "s_suppkey": T.LongType(), "s_name": T.StringType(),
        "s_nationkey": T.IntegerType(), "s_acctbal": T.DoubleType(),
        "p_partkey": T.LongType(), "p_name": T.StringType(),
        "p_brand": T.StringType(), "p_type": T.StringType(),
        "p_size": T.IntegerType(), "p_retailprice": T.DoubleType(),
        "o_orderkey": T.LongType(), "o_custkey": T.LongType(),
        "o_orderstatus": T.StringType(), "o_totalprice": T.DoubleType(),
        "o_orderdate": T.TimestampType(), "o_orderpriority": T.StringType(),
    }
    for vt, slots in TPCH_VERTEX_SLOTS.items():
        reg.def_vertex(vt, {s: type_map[s] for s in slots})
    for et in ["in_nation", "supp_nation", "in_region", "placed",
               "contains", "supplied_by"]:
        reg.def_edge(et)
    return reg


_TPCH_GRAPH_CACHE: dict[tuple[int, str], "GraphStore"] = {}


def load_tpch_graph(spark: SparkSession, sf_dir: str) -> GraphStore:
    """Project the driver's TPC-H-ish tables onto the graph model (F6):

    vertices: region nation customer supplier part orders
    edges:    in_nation(customer->nation)  supp_nation(supplier->nation)
              in_region(nation->region)    placed(customer->orders)
              contains(orders->part, weight=l_quantity)   [from lineitem]
              supplied_by(orders->supplier)                [from lineitem]

    The projection is memoized per (session, sf_dir) — it is pure logical
    plan construction over immutable files (a catalog entry, in engine
    terms), and the GraphStore it returns is read-only for query callers;
    rebuilding it per query only re-reads seven parquet footers and
    re-derives the same lineage. A real deployment mints this projection
    once at ingest (sources/bucketed.py), so the cache mirrors the scale
    architecture rather than hiding work.
    """
    key = (id(spark), sf_dir)
    cached = _TPCH_GRAPH_CACHE.get(key)
    if cached is not None:
        return cached
    reg = build_tpch_registry()
    g = GraphStore(spark, reg, name=f"tpch:{sf_dir}", has_tombstones=False)

    raw = {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TPCH_VERTEX_SLOTS}
    for vt, df in raw.items():
        g.add_vertices(vt, _sys_cols(df, vt, F.col(TPCH_KEYS[vt])))

    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # The synthetic lineitem contains duplicate (l_orderkey, l_linenumber)
    # pairs (caught by check-data-integrity's duplicate-ids scan), so the
    # natural key alone is not a valid edge id — disambiguate with a
    # deterministic per-duplicate ordinal. At real scale this id is minted
    # once at ingest, not per load (see sources/bucketed.py).
    from pyspark.sql import Window as _W

    _dup_w = _W.partitionBy("l_orderkey", "l_linenumber").orderBy(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    lineitem = lineitem.withColumn("__dup_rn", F.row_number().over(_dup_w))
    vid = lambda t, c: F.concat(F.lit(t + ":"), c.cast("string"))  # noqa: E731

    g.add_edges("in_nation", _edge(
        raw["customer"], "in_nation", F.col("c_custkey"),
        vid("customer", F.col("c_custkey")), vid("nation", F.col("c_nationkey"))),
        src_type="customer", dst_type="nation")
    g.add_edges("supp_nation", _edge(
        raw["supplier"], "supp_nation", F.col("s_suppkey"),
        vid("supplier", F.col("s_suppkey")), vid("nation", F.col("s_nationkey"))),
        src_type="supplier", dst_type="nation")
    g.add_edges("in_region", _edge(
        raw["nation"], "in_region", F.col("n_nationkey"),
        vid("nation", F.col("n_nationkey")), vid("region", F.col("n_regionkey"))),
        src_type="nation", dst_type="region")
    g.add_edges("placed", _edge(
        raw["orders"], "placed", F.col("o_orderkey"),
        vid("customer", F.col("o_custkey")), vid("orders", F.col("o_orderkey"))),
        src_type="customer", dst_type="orders")
    li_eid = F.concat(F.col("l_orderkey").cast("string"), F.lit("_"),
                      F.col("l_linenumber").cast("string"), F.lit("_"),
                      F.col("__dup_rn").cast("string"))
    g.add_edges("contains", _edge(
        lineitem, "contains", li_eid,
        vid("orders", F.col("l_orderkey")), vid("part", F.col("l_partkey")),
        weight=F.col("l_quantity")), src_type="orders", dst_type="part")
    g.add_edges("supplied_by", _edge(
        lineitem, "supplied_by", li_eid,
        vid("orders", F.col("l_orderkey")), vid("supplier", F.col("l_suppkey"))),
        src_type="orders", dst_type="supplier")
    _TPCH_GRAPH_CACHE[key] = g
    return g
