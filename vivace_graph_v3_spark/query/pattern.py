"""JSON pattern-query DSL + named parameterized queries (the REST surface).

Reference semantics reproduced (citations into /root/reference):

- Ad-hoc JSON pattern queries (rest.lisp:448-589): a ``match`` list of
  vertex/edge patterns, a ``where`` list of slot comparisons, a ``select``
  projection, ``limit``/``skip`` — compiled to a bounded read-only select
  from a fixed set of pattern kinds (``compile-pattern-query``
  rest.lisp:543-562). SURVEY.md calls this "the most direct Spark mapping in
  the whole system": it compiles 1:1 onto goal-list queries.
- ``def-query`` (rest.lisp:367-433): a named, precompiled query with typed
  parameter coercion (rest.lisp:59-99), safe read-only defaults (limit 1000,
  bounded work — rest.lisp:31-36) and parameter binding via the ``param``
  goal (prolog-functors.lisp:144-152).
- Error taxonomy (rest.lisp:420-433): bad param -> :class:`ParamError`
  (the 400 analog); unknown query -> KeyError.

The HTTP layer itself is out of scope (SURVEY.md §2.1) — these are the
engine-side entry points a thin REST driver would call.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from typing import Any

from pyspark.sql import DataFrame, functions as F

from vivace_graph_v3_spark.graph import GraphStore
from vivace_graph_v3_spark.query.builder import QueryError, Select, is_var

DEFAULT_LIMIT = 1000  # rest.lisp:31-36 *rest-default-limit*

_WHERE_OPS = {"=", "!=", "<", ">", "<=", ">=", "regex", "in", "not-in"}


class ParamError(QueryError):
    """Parameter coercion/validation failure (rest.lisp:420-424)."""


# -- pattern DSL ---------------------------------------------------------------

def pattern_to_goals(spec: dict) -> tuple[list[str], list[tuple]]:
    """Compile the JSON pattern body to (vars, goals) for ``select``.

    ``match`` entries (rest.lisp:543-562 pattern kinds):
      {"vertex": "?a", "type": "person"}            -> is-a
      {"edge": "knows", "from": "?a", "to": "?b"
       [, "weight": "?w"]}                          -> edge relation
    ``where`` entries:
      {"slot": ["?a", "age"], "var": "?x"}          -> bind slot to var
      {"slot": ["?a", "age"], "op": ">", "value": 30}
      {"var": "?x", "op": "<=", "value": 10}
      {"var": "?x", "op": "regex", "value": "^A"}
      {"var": "?x", "op": "in"|"not-in", "value": [..]}
    ``select``: list of "?var" or {"slot": ["?a","name"], "as": "?name"}.
    """
    goals: list[tuple] = []
    n_slot = 0
    for m in spec.get("match", []):
        if "vertex" in m:
            if not is_var(m["vertex"]):
                raise QueryError(f"vertex pattern must bind a variable: {m}")
            goals.append(("is-a", m["vertex"], m.get("type", m.get("is", None))))
            if goals[-1][2] is None:
                raise QueryError(f"vertex pattern needs a type: {m}")
        elif "edge" in m:
            args = [m["edge"], m.get("from", "?_src"), m.get("to", "?_dst")]
            if "weight" in m:
                args.append(m["weight"])
            goals.append(tuple(args))
        else:
            raise QueryError(f"unknown match pattern: {m}")

    for w in spec.get("where", []):
        subject = w.get("var")
        if "slot" in w:
            node, slot = w["slot"]
            subject = w.get("var") or f"?__s{n_slot}"
            n_slot += 1
            goals.append(("node-slot-value", node, slot, subject))
        if "op" in w:
            op, value = w["op"], w.get("value")
            if op not in _WHERE_OPS:
                raise QueryError(f"unknown where op: {op}")
            if subject is None:
                raise QueryError(f"where needs a var or slot: {w}")
            if op == "regex":
                goals.append(("regex-match", value, subject))
            elif op == "in":
                goals.append(("__in", subject, list(value)))
            elif op == "not-in":
                goals.append(("not-in-list", subject, list(value)))
            elif op == "=":
                goals.append(("==", subject, value))
            elif op == "!=":
                goals.append(("/=", subject, value))
            else:
                goals.append((op, subject, value))

    sel_vars: list[str] = []
    for s in spec.get("select", []):
        if isinstance(s, str):
            sel_vars.append(s)
        elif isinstance(s, dict) and "slot" in s:
            node, slot = s["slot"]
            out = s.get("as") or f"?{slot}"
            goals.append(("node-slot-value", node, slot, out))
            sel_vars.append(out)
        else:
            raise QueryError(f"unknown select entry: {s}")
    if not sel_vars:
        raise QueryError("pattern query needs a non-empty select")
    return sel_vars, goals


def _g_in(builder, plan, args):
    x, items = args
    return plan.df.filter(builder.resolve(plan, x).isin(list(items)))


def compile_pattern_query(graph: GraphStore, spec: dict, *,
                          params: dict | None = None) -> DataFrame:
    """``compile-pattern-query`` (rest.lisp:543-562): JSON body -> bounded
    read-only DataFrame. Applies the REST layer's safe defaults."""
    sel_vars, goals = pattern_to_goals(spec)
    sel = Select(
        graph, sel_vars, goals,
        limit=int(spec.get("limit", DEFAULT_LIMIT)),
        skip=int(spec["skip"]) if spec.get("skip") else None,
        distinct=bool(spec.get("distinct", False)),
        order_by=spec.get("order_by"),
        descending=bool(spec.get("descending", False)),
        params=params or {},
        # client-supplied queries are strictly read-only (rest.lisp:448-456:
        # "no server-authored template, no client Lisp") — the DSL cannot
        # express effecting goals, and the sandbox enforces it regardless
        allowed_effects=frozenset(),
    )
    # 'in' membership is a local helper, not a global functor
    orig = sel.compile_goal

    def compile_goal(plan, goal):
        if goal[0] == "__in":
            from vivace_graph_v3_spark.query.builder import Plan
            return Plan(_g_in(sel, plan, goal[1:]))
        return orig(plan, goal)

    sel.compile_goal = compile_goal
    return sel.to_df()


# -- def-query: named parameterized queries ------------------------------------

_COERCERS = {
    "int": int,
    "float": float,
    "string": str,
    "bool": lambda v: v if isinstance(v, bool) else str(v).lower() in ("1", "true", "t", "yes"),
    "timestamp": lambda v: v if isinstance(v, datetime) else datetime.fromisoformat(str(v)),
}


@dataclass
class NamedQuery:
    """One ``def-query`` registration (rest.lisp:367-433)."""

    name: str
    vars: list[str]
    goals: list[tuple]
    params: dict[str, str] = field(default_factory=dict)  # name -> type
    defaults: dict[str, Any] = field(default_factory=dict)
    limit: int | None = DEFAULT_LIMIT
    order_by: list[str] | None = None
    distinct: bool = False
    # rest.lisp:384-391 ":EFFECTS the side-effect policy (default NIL =
    # read-only; a forbidden write/eval attempt yields a 403)"
    effects: frozenset = frozenset()

    def coerce(self, raw: dict) -> dict:
        out = {}
        for pname, ptype in self.params.items():
            if pname in raw:
                try:
                    out[pname] = _COERCERS[ptype](raw[pname])
                except (ValueError, TypeError) as ex:
                    raise ParamError(
                        f"query {self.name}: param {pname!r} is not a valid "
                        f"{ptype}: {raw[pname]!r}") from ex
            elif pname in self.defaults:
                out[pname] = self.defaults[pname]
            else:
                raise ParamError(f"query {self.name}: missing param {pname!r}")
        return out


_QUERIES: dict[str, NamedQuery] = {}


def def_query(name: str, *, vars: list[str], goals: list[tuple],
              params: dict[str, str] | None = None,
              defaults: dict[str, Any] | None = None,
              limit: int | None = DEFAULT_LIMIT,
              order_by: list[str] | None = None,
              distinct: bool = False,
              effects: set[str] | frozenset = frozenset()) -> NamedQuery:
    """Register a named query. ``params`` maps param name -> type name
    (int/float/string/bool/timestamp, rest.lisp:59-99); goals reference them
    via ``('param', '?x', 'name')``. ``effects`` is the side-effect policy
    (rest.lisp:384-391): default read-only — a goal needing ``eval``/
    ``write`` raises EffectNotAllowed (HTTP 403 through the REST layer)
    unless the server author opts it in here."""
    bad = [t for t in (params or {}).values() if t not in _COERCERS]
    if bad:
        raise ParamError(f"unknown param types: {bad}")
    q = NamedQuery(name=name, vars=list(vars), goals=list(goals),
                   params=dict(params or {}), defaults=dict(defaults or {}),
                   limit=limit, order_by=order_by, distinct=distinct,
                   effects=frozenset(effects))
    _QUERIES[name] = q
    return q


def run_query(graph: GraphStore, name: str, params: dict | None = None,
              **overrides) -> DataFrame:
    """``call-rest-query`` (rest.lisp:435-446): coerce params, run the
    precompiled select under its registered bounds and effect policy."""
    q = _QUERIES[name]
    bound = q.coerce(params or {})
    opts = dict(limit=q.limit, order_by=q.order_by, distinct=q.distinct,
                allowed_effects=q.effects)
    opts.update(overrides)
    return Select(graph, q.vars, q.goals, params=bound, **opts).to_df()


def clear_queries() -> None:
    _QUERIES.clear()


_ = F  # noqa: F841  (kept for symmetry with sibling modules)
