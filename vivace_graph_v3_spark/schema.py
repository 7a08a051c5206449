"""Schema registry: the Spark analog of the reference's ``def-vertex`` /
``def-edge`` CLOS metaclasses.

Reference semantics reproduced here (citations into /root/reference):

- ``def-vertex`` / ``def-edge`` declare typed node classes with slots and a
  single-inheritance parent (schema.lisp:427-451 -> def-node-type
  schema.lisp:224-425).
- Subclass scans include subtypes: a scan for ``person`` must include
  ``customer`` rows when customer ⊂ person (vertex.lisp:195-208,
  views.lisp:256-284). We expose that as :meth:`SchemaRegistry.subtype_closure`
  and the query layer compiles ``is-a`` to ``type IN closure``.
- System columns on every node: ``id`` (string uuid), ``type``, ``deleted``
  (soft delete, vertex.lisp:157-222), ``revision``, ``commit_epoch`` (MVCC,
  transactions.lisp:395-462). Edges add ``src``, ``dst``, ``weight``
  (edge.lisp:11-20).
- Per-type ``keep_revisions`` retention (schema.lisp:38-49) is carried as
  metadata for the MVCC reaper (mvcc.py).

Spark-first decision: slots become real typed columns (the reference stores a
serialized plist per row — serialize.lisp:162-183 — which is an engine
mechanic, not a semantic). Per-type DataFrames keep scans pruned; a union view
is synthesized only when a query genuinely spans types.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# System columns present on every vertex row (FIXTURES.md contract).
VERTEX_SYSTEM_FIELDS = [
    T.StructField("id", T.StringType(), False),
    T.StructField("type", T.StringType(), False),
    T.StructField("deleted", T.BooleanType(), False),
    T.StructField("revision", T.LongType(), False),
    T.StructField("commit_epoch", T.LongType(), False),
]

# Edges add endpoints + weight (edge.lisp:11-20: from/to ids + float64 weight).
EDGE_SYSTEM_FIELDS = VERTEX_SYSTEM_FIELDS + [
    T.StructField("src", T.StringType(), False),
    T.StructField("dst", T.StringType(), False),
    T.StructField("weight", T.DoubleType(), False),
]

SYSTEM_COLUMNS = {"id", "type", "deleted", "revision", "commit_epoch", "src", "dst", "weight"}


@dataclass
class NodeType:
    """One declared node type (schema.lisp:38-49 ``node-type`` struct)."""

    name: str
    kind: str  # 'vertex' | 'edge'
    slots: dict[str, T.DataType] = field(default_factory=dict)
    parent: str | None = None
    keep_revisions: int | None = None  # None = keep all (MVCC retention)

    def struct_type(self) -> T.StructType:
        sys_fields = VERTEX_SYSTEM_FIELDS if self.kind == "vertex" else EDGE_SYSTEM_FIELDS
        slot_fields = [T.StructField(n, t, True) for n, t in self.slots.items()]
        return T.StructType(sys_fields + slot_fields)


class SchemaRegistry:
    """Holds declared vertex/edge types and the inheritance hierarchy.

    Max-types and diff-on-redefinition behavior of the reference
    (schema.lisp:453-464, globals.lisp:39) degenerate to plain dict updates
    here; redefining a type replaces its slots.
    """

    def __init__(self) -> None:
        self._types: dict[str, NodeType] = {}

    def def_vertex(self, name, slots, parent=None, keep_revisions=None) -> NodeType:
        return self._define(name, "vertex", slots, parent, keep_revisions)

    def def_edge(self, name, slots=None, parent=None, keep_revisions=None) -> NodeType:
        return self._define(name, "edge", slots or {}, parent, keep_revisions)

    def _define(self, name, kind, slots, parent, keep_revisions) -> NodeType:
        if parent is not None:
            p = self._types.get(parent)
            if p is None or p.kind != kind:
                raise ValueError(f"unknown parent {kind} type: {parent}")
            # Single inheritance: child sees parent slots (schema.lisp:224-425).
            merged = dict(p.slots)
            merged.update(slots)
            slots = merged
        nt = NodeType(name=name, kind=kind, slots=dict(slots), parent=parent,
                      keep_revisions=keep_revisions)
        self._types[name] = nt
        return nt

    def get(self, name: str) -> NodeType:
        try:
            return self._types[name]
        except KeyError:
            raise KeyError(f"undeclared node type: {name}") from None

    def types(self, kind: str | None = None) -> list[NodeType]:
        return [t for t in self._types.values() if kind is None or t.kind == kind]

    def subtype_closure(self, name: str) -> list[str]:
        """``name`` + all (transitive) subtypes — the reference's
        include-subclasses-p scan set (vertex.lisp:195-208)."""
        self.get(name)
        out, frontier = [name], {name}
        while frontier:
            nxt = {t.name for t in self._types.values() if t.parent in frontier}
            nxt -= set(out)
            out.extend(sorted(nxt))
            frontier = nxt
        return out

    def ancestors(self, name: str) -> list[str]:
        """Path to the root type — used by view attachment (views.lisp:256-284)."""
        out = []
        cur = self.get(name).parent
        while cur is not None:
            out.append(cur)
            cur = self.get(cur).parent
        return out


# Module-level default registry + convenience functions mirroring the macros.
DEFAULT_REGISTRY = SchemaRegistry()


def def_vertex(name, slots, parent=None, keep_revisions=None, registry=None):
    return (registry or DEFAULT_REGISTRY).def_vertex(name, slots, parent, keep_revisions)


def def_edge(name, slots=None, parent=None, keep_revisions=None, registry=None):
    return (registry or DEFAULT_REGISTRY).def_edge(name, slots, parent, keep_revisions)
