"""Materialized map/reduce views — the Spark analog of the reference's
CouchDB-style incremental views (views.lisp).

Reference semantics reproduced:

- ``def-view`` declares a per-class view with a ``:map`` lambda that yields
  0..n (key, value) pairs per node and an optional ``:reduce (keys values) ->
  value`` (views.lisp:750-793). A view attaches to a class and all its
  descendants (views.lisp:256-284) — we scan the subtype closure.
- Views are sorted by key, ascending (``:lessp``) or descending
  (``:greaterp``), with node-id tiebreak in the same direction
  (views.lisp:32, 313-329, 505-520).
- Lookup surface ``invoke-graph-view`` (views.lisp:674-727): map view by key
  or [start,end] range with skip/count paging counted over visible entries
  (views.lisp:544-622); reduce view: grand total (default), per-key with
  ``group_p + key``, all groups with ``group_p``.
- The reference maintains reduce views *incrementally* on commit
  (views.lisp:331-374 insert, 400-427 delete). Spark-first, a view is a
  deterministic function of the base table: we materialize with groupBy —
  Catalyst's partial aggregation IS the pairwise re-reduce — and offer
  ``refresh``/caching for reuse; streaming incremental maintenance lives in
  streaming/replication.py over the txn log.

Map functions are **declarative**: a map_fn takes the class scan DataFrame and
returns a DataFrame with columns (id, key, value) — multi-emit is an
``explode``, not a Python loop, so the whole pipeline stays JVM-side unless
the user genuinely needs a pandas UDF.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, Window, functions as F

from vivace_graph_v3_spark.graph import GraphStore

# Global view registry, keyed by (class_name, view_name) — the analog of the
# per-graph view table (views.lisp:14-32).
_VIEWS: dict[tuple[str, str], "View"] = {}


@dataclass
class View:
    """One declared view (def-view, views.lisp:750-793)."""

    class_name: str
    name: str
    kind: str  # 'vertex' | 'edge'
    map_fn: Callable[[DataFrame], DataFrame]  # scan df -> (id, key, value)
    reduce_agg: Column | None = None  # aggregate over 'value', e.g. F.sum
    order: str = "lessp"  # 'lessp' ascending | 'greaterp' descending
    # Heterogeneous keys (utilities.lisp:237-309 cross-type less-than): the
    # map_fn emits a variant-struct key (functions.term_order.variant_key)
    # and the cursor orders/filters by its (type_rank, num, str) composite.
    mixed: bool = False

    def __post_init__(self):
        self._cache: dict[str, DataFrame] = {}

    # -- materialization -----------------------------------------------------

    def base_scan(self, graph: GraphStore) -> DataFrame:
        if self.kind == "edge":
            return graph.active_edges(self.class_name)
        return graph.scan_vertices(self.class_name, include_subclasses=True)

    def materialize(self, graph: GraphStore) -> DataFrame:
        """The map view table: (id, key, value), sorted contract per
        views.lisp:313-329 applied at read time by cursor()."""
        ck = f"map:{graph.name}"
        if ck not in self._cache:
            mapped = self.map_fn(self.base_scan(graph))
            cols = mapped.columns
            if "value" not in cols:
                mapped = mapped.withColumn("value", F.lit(None))
            self._cache[ck] = mapped.select("id", "key", "value")
        return self._cache[ck]

    def reduced(self, graph: GraphStore) -> DataFrame:
        """Per-key aggregates (views.lisp:345-373): reduce applied per key.
        groupBy gives map-side partial aggregation — the distributed analog
        of the reference's pairwise incremental re-reduce."""
        if self.reduce_agg is None:
            raise ValueError(f"view {self.name} has no reduce")
        ck = f"red:{graph.name}"
        if ck not in self._cache:
            self._cache[ck] = (self.materialize(graph)
                               .groupBy("key")
                               .agg(self.reduce_agg.alias("value")))
        return self._cache[ck]

    def grand_total(self, graph: GraphStore) -> DataFrame:
        """The (:gagg, max-key) grand-total row (views.lisp:345-373):
        re-reduce over the per-key values."""
        if self.reduce_agg is None:
            raise ValueError(f"view {self.name} has no reduce")
        return self.materialize(graph).agg(self.reduce_agg.alias("value"))

    # -- cursor / lookup surface (views.lisp:544-622, 674-727) ----------------

    def cursor(self, graph: GraphStore, *, key=None, start_key=None,
               end_key=None, skip: int = 0, count: int | None = None,
               reduced: bool = False) -> DataFrame:
        """Ordered scan with exact-key / [start,end] range + paging. Paging is
        counted over visible entries after the range filter, in view order
        (key, id) asc for :lessp / desc for :greaterp."""
        df = self.reduced(graph) if reduced else self.materialize(graph)
        if self.mixed:
            # cross-type order: compare/sort on the (rank, num, str)
            # composite, never the raw variant struct (whose field order
            # would sort booleans before every number)
            from vivace_graph_v3_spark.functions.term_order import (
                variant_lit, variant_sort_key)
            kc = variant_sort_key(F.col("key"))
            enc = lambda v: variant_sort_key(variant_lit(v))  # noqa: E731
        else:
            kc = F.col("key")
            enc = F.lit
        if key is not None:
            df = df.filter(kc == enc(key))
        if start_key is not None:
            df = df.filter(kc >= enc(start_key))
        if end_key is not None:
            df = df.filter(kc <= enc(end_key))
        order = [kc, F.col("id")] if not reduced else [kc]
        if self.order == "greaterp":
            order = [c.desc() for c in order]
        df = df.orderBy(*order)
        if skip:
            df = df.offset(skip)
        if count is not None:
            df = df.limit(count)
        return df


def def_view(class_name: str, name: str, map_fn, *, kind: str = "vertex",
             reduce_agg: Column | None = None, order: str = "lessp",
             mixed: bool = False) -> View:
    """``def-view`` (views.lisp:750-793). ``map_fn(scan_df) -> DataFrame`` with
    columns (id, key[, value]); 0..n rows per node via where/explode.
    ``mixed=True`` declares a heterogeneous key (variant struct, see
    functions/term_order.py) ordered by the reference's cross-type
    less-than."""
    v = View(class_name=class_name, name=name, kind=kind, map_fn=map_fn,
             reduce_agg=reduce_agg, order=order, mixed=mixed)
    _VIEWS[(class_name, name)] = v
    return v


def get_view(class_name: str, name: str) -> View:
    try:
        return _VIEWS[(class_name, name)]
    except KeyError:
        raise KeyError(f"undefined view {class_name}/{name}") from None


def invoke_graph_view(graph: GraphStore, class_name: str, name: str, *,
                      key=None, start_key=None, end_key=None, skip: int = 0,
                      count: int | None = None, group_p: bool = False) -> DataFrame:
    """Unified lookup (views.lisp:674-727):

    - map view (no reduce): rows by key / range, paged
    - reduce view, default: the grand total (one row)
    - reduce view, group_p + key: that key's aggregate
    - reduce view, group_p: all per-key aggregates
    """
    view = get_view(class_name, name)
    if view.reduce_agg is None:
        return view.cursor(graph, key=key, start_key=start_key,
                           end_key=end_key, skip=skip, count=count)
    if not group_p:
        return view.grand_total(graph)
    return view.cursor(graph, key=key, start_key=start_key, end_key=end_key,
                       skip=skip, count=count, reduced=True)


def map_view(graph: GraphStore, class_name: str, name: str, **cursor_kw) -> DataFrame:
    """``map-view`` ordered scan (views.lisp:544-622)."""
    return get_view(class_name, name).cursor(graph, **cursor_kw)


def map_reduced_view(graph: GraphStore, class_name: str, name: str,
                     **cursor_kw) -> DataFrame:
    """``map-reduced-view`` (views.lisp:627-672)."""
    return get_view(class_name, name).cursor(graph, reduced=True, **cursor_kw)


_ = Window  # re-exported pattern for custom paging in user map_fns
