"""Goal-list query builder — the Spark analog of the reference's Prolog
``select`` macro family (prologc.lisp:951-1116).

The reference compiles a conjunction of goals to nested continuation-passing
closures and runs a depth-first nested-loop join with index-accelerated inner
scans (compile-body prologc.lisp:702-734; access-path dispatch
schema.lisp:316-361). That whole engine is *replaced* by Catalyst: each goal
contributes a relation / filter / projection to a DataFrame plan, bindings
flow left-to-right exactly like Prolog variable bindings, and Catalyst picks
join order and physical strategy (broadcast/hash/SMJ) — an upgrade over the
reference, whose goal order IS its execution order (SURVEY.md §4.1).

Variables are ``?name`` strings; a variable is *bound* once some goal has
produced a column for it. A goal over unbound variables introduces a relation
(scan); over bound variables it becomes a filter or join — the declarative
analog of the reference's bound-argument access-path selection.

Supported goals (reference citations in each handler):

  ('is-a', ?v, type)                 type scan / type test (prolog-functors.lisp:832-857)
  (<edge-type>, ?a, ?b)              edge relation (schema.lisp:309-361)
  (<edge-type>, ?a, ?b, ?w)          + weight (schema.lisp:362-420)
  ('outgoing-edges', ?v, etype, ?e, ?to)   (prolog-functors.lisp:678-732)
  ('incoming-edges', ?v, etype, ?e, ?from) (prolog-functors.lisp:635-676)
  ('node-slot-value'|'slot', ?v, slot, ?x) (prolog-functors.lisp:791-805)
  ('weight', ?e, ?w)                 (prolog-functors.lisp:807-812)
  ('=', a, b) ('==',) ('/=',) ('<','>','<=','>=')   (prolog-functors.lisp:48-84)
  ('regex-match', pattern, ?s)       (prolog-functors.lisp:133-139)
  ('valid-date-p', ?s)               (prolog-functors.lisp:349-357)
  ('not-in-list', ?x, [..])          (prolog-functors.lisp:94-96)
  ('is', ?x, expr)                   arithmetic (prolog-functors.lisp:98-116)
  ('lispp', expr)                    boolean expression filter (prolog-functors.lisp:118-124)
  ('param', ?x, name)                (prolog-functors.lisp:144-152)
  ('not', goal...)                   negation as failure (prologc.lisp:492-518)
  ('or', [goals], [goals], ...)      disjunction (prologc.lisp:432-447)
  ('unique', ?x)                     solution dedup (prolog-functors.lisp:814-830)
  ('once', goal...)                  first solution per outer row (prologc.lisp:520-545)
  ('findall', template, [goals], ?list)    (prolog-functors.lisp:472-477)
  ('bagof', template, [goals], ?list)      (prolog-functors.lisp:498-503)
  ('setof', template, [goals], ?list)      (prolog-functors.lisp:505-508)
  ('^', [?vars], goal)               existential quantifier inside bagof/setof
  ('forall', [cond], [action])       (prologc.lisp:571-582)
  ('call', functor, args...)         registered python relation/predicate
                                     (def-global-prolog-functor analog,
                                     prolog-functors.lisp:9-21)
  ('write', term) ('nl',)            per-solution REPL output, replayed by
                                     run_io (prolog-functors.lisp:26-36)
  ('read', ?x)                       bind/test one term from Select's
                                     io_input stream (read/1)

Ordering contract: the reference's solution order is discovery order —
unspecified by contract (SURVEY.md §7.3). ``limit``/``skip``/``once`` are
deterministic here only when ``order_by`` is given; aggregate list values are
sorted. Tests compare multisets.
"""

from __future__ import annotations

import fnmatch
import operator
from typing import Any, Callable

from pyspark.sql import Column, DataFrame, functions as F

from vivace_graph_v3_spark.graph import GraphStore

# User-defined functors (the def-global-prolog-functor analog): name ->
# callable(builder, plan, args) -> DataFrame. Registered via register_functor.
_USER_FUNCTORS: dict[str, Callable] = {}


def register_functor(name: str, fn: Callable) -> None:
    _USER_FUNCTORS[name] = fn


def is_var(t: Any) -> bool:
    return isinstance(t, str) and t.startswith("?")


def var_col(t: str) -> str:
    return t[1:]


class QueryError(Exception):
    pass


class EffectNotAllowed(QueryError):
    """Reference: require-effect / *allowed-effects* (prologc.lisp:902-943)."""


class PrologThrow(QueryError):
    """An in-flight ball from throw/1 (prolog-functors.lisp:258-268) awaiting
    an enclosing catch/3; uncaught, it aborts the query like the reference's
    prolog-throw error.

    The message embeds the ball between sentinels so that a PrologThrow
    raised inside a Python UDF on an EXECUTOR — which reaches the driver
    only as traceback text inside a PythonException — can be recovered and
    re-unified with an enclosing catch (see Select._execute)."""

    def __init__(self, ball: Any):
        self.ball = ball
        super().__init__(f"uncaught Prolog throw: {ball!r} "
                         f"[__prolog_ball__{ball!r}__end_ball__]")


_BALL_RE = None


def _extract_ball(text: str):
    """Recover a thrown ball from exception text (literal balls only —
    strings/numbers/tuples/lists survive the repr round-trip)."""
    global _BALL_RE
    import ast
    import re
    if _BALL_RE is None:
        _BALL_RE = re.compile(r"__prolog_ball__(.*?)__end_ball__", re.S)
    m = _BALL_RE.search(text)
    if m is None:
        return None
    try:
        return ast.literal_eval(m.group(1))
    except (ValueError, SyntaxError):
        return None


_CMP = {"<": operator.lt, ">": operator.gt, "<=": operator.le, ">=": operator.ge}

_ARITH = {
    "+": lambda a, b: a + b, "-": lambda a, b: a - b,
    "*": lambda a, b: a * b, "/": lambda a, b: a / b,
    "mod": lambda a, b: a % b,
}


class Plan:
    """Current compilation state: a DataFrame whose columns are the bound
    variables (column name = var name without '?')."""

    def __init__(self, df: DataFrame | None = None):
        self.df = df

    @property
    def bound(self) -> set[str]:
        return set(self.df.columns) if self.df is not None else set()

    def merge(self, rel: DataFrame, rel_vars: list[str]) -> "Plan":
        """Join a new relation in on its shared bound variables; cartesian if
        none are shared (pure Prolog conjunction of independent goals)."""
        if self.df is None:
            return Plan(rel)
        shared = [v for v in rel_vars if v in self.bound]
        new_cols = [v for v in rel_vars if v not in self.bound]
        if shared:
            out = self.df.join(rel, on=shared, how="inner")
        else:
            out = self.df.crossJoin(rel)
        _ = new_cols
        return Plan(out)


class Select:
    """The ``select`` entry point (prologc.lisp:951-1037).

    Options mirror the reference's option plist: limit/skip
    (prologc.lisp:825-831), count-only (832-857), flat, distinct
    (*seen-table*), params (*query-params*, prolog-functors.lisp:144-152),
    allowed_effects (prologc.lisp:902-943). ``order_by`` is the explicit
    ordering contract Spark needs for deterministic limit/skip.
    """

    def __init__(self, graph: GraphStore, vars: list[str], goals: list[tuple], *,
                 limit: int | None = None, skip: int | None = None,
                 count_only: bool = False, distinct: bool = False,
                 order_by: list[str] | None = None, descending: bool = False,
                 params: dict[str, Any] | None = None,
                 allowed_effects: set[str] | None = None,
                 include_deleted: bool = False,
                 io_input=None, reorder: bool = True):
        self.graph = graph
        self.vars = vars
        if reorder:
            # connectivity-aware pre-ordering (query/reorder.py): identity
            # on already-connected goal lists, avoids CartesianProduct on
            # badly-ordered ones. Catalyst does NOT reorder inner joins
            # without CBO stats, so this is the builder's job.
            from vivace_graph_v3_spark.query.reorder import reorder_goals

            etypes = set(graph.edge_types())
            goals = reorder_goals(list(goals), lambda h: h in etypes)
        self.goals = goals
        self.limit = limit
        self.skip = skip
        self.count_only = count_only
        self.distinct = distinct
        self.order_by = order_by
        self.descending = descending
        self.params = params or {}
        # default mirrors the reference: a direct `select` allows everything;
        # the REST/pattern layer passes frozenset() for read-only safety
        # (rest.lisp:31-36 vs prologc.lisp:902-943)
        self.allowed_effects = ({"eval", "write", "io"}
                                if allowed_effects is None
                                else set(allowed_effects))
        self.include_deleted = include_deleted
        # REPL I/O functor state: ``read`` consumes terms from io_input at
        # plan build; ``write``/``nl`` record per-solution output actions
        # replayed by run_io (prolog-functors.lisp:26-36).
        self.io_input = iter(io_input) if io_input is not None else None
        self._io_actions: list[tuple[str, Any]] = []
        # run-time catch/3 state: frames recorded per compile (innermost
        # last), and the catch goals forced into their recovery branch on a
        # re-plan after an execution-time throw (see _execute).
        self._catch_frames: list[tuple[int, Any]] = []
        self._forced_recovery: dict[int, Any] = {}

    def _require_effect(self, effect: str, functor: str) -> None:
        """require-effect (prologc.lisp:902-943): functors with side effects
        run only when the query's effect sandbox allows them."""
        if effect not in self.allowed_effects:
            raise EffectNotAllowed(
                f"functor {functor!r} requires the {effect!r} effect")

    # -- public API -----------------------------------------------------------

    def to_df(self) -> DataFrame:
        self._catch_frames = []
        self._io_actions = []
        plan = self.compile_goals(Plan(), self.goals)
        if plan.df is None:
            raise QueryError("empty goal list")
        df = plan.df
        out_cols = [var_col(v) for v in self.vars]
        missing = [c for c in out_cols if c not in df.columns]
        if missing:
            raise QueryError(f"unbound select variables: {missing}")
        df = df.select(*out_cols)
        if self.distinct:
            df = df.dropDuplicates()
        if self.order_by:
            cols = [F.col(var_col(v)) for v in self.order_by]
            df = df.orderBy(*[c.desc() for c in cols] if self.descending else cols)
        if self.skip:
            df = df.offset(self.skip)
        if self.limit is not None:
            df = df.limit(self.limit)
        if self.count_only:
            # select-count (prologc.lisp:1044-1049): count solutions after
            # skip/limit without materializing rows.
            return df.agg(F.count(F.lit(1)).alias("count"))
        return df

    def count(self) -> int:
        self.count_only = False
        return self._execute(lambda df: df.count())

    def collect(self):
        """Execute and collect rows, with run-time catch/3 semantics."""
        return self._execute(lambda df: df.collect())

    def _execute(self, action):
        """Run a Spark action with RUN-TIME catch/3 (prolog-functors.lisp:
        270-330): the reference also fields balls thrown while the query is
        *running* (e.g. from a lisp/is eval or a user functor), not just at
        compile time. Spark plans are lazy, so a throw inside a Python UDF
        surfaces here as a PythonException whose traceback text carries the
        sentinel-wrapped ball. Recovery = ISO semantics via re-planning:
        unify the ball against compiled catch frames innermost-first, force
        the matching catch goal into its Recovery branch, and re-execute.
        There is no per-row control transfer (set semantics — the whole
        goal branch's solutions are replaced by Recovery's), matching how
        this engine reinterprets backtracking throughout."""
        try:
            tried: set[int] = set()
            for _ in range(len(self.goals) + 2):
                try:
                    return action(self.to_df())
                except PrologThrow:
                    raise
                except Exception as ex:
                    ball = _extract_ball(str(ex))
                    if ball is None:
                        raise
                    frame = next(
                        (key for key, catcher in reversed(self._catch_frames)
                         if key not in tried
                         and (is_var(catcher) or catcher == ball)), None)
                    if frame is None:
                        raise PrologThrow(ball) from ex
                    tried.add(frame)
                    self._forced_recovery[frame] = ball
            raise QueryError("catch/3 recovery did not converge")
        finally:
            self._forced_recovery = {}

    def run_io(self, out=None) -> int:
        """Top-level REPL execution (the reference's interactive query loop):
        run the query and replay the recorded ``write``/``nl`` actions once
        per solution, streaming rows through foreach — never materializing
        the result driver-side. Returns the solution count."""
        import sys
        out = out if out is not None else sys.stdout

        df = self.to_df()          # compiles goals -> records io actions
        actions = list(self._io_actions)

        def emit(row):
            for kind, term in actions:
                if kind == "nl":
                    out.write("\n")
                elif is_var(term):
                    out.write(f"{row[var_col(term)]}")
                else:
                    out.write(f"{term}")

        n = 0
        for row in df.toLocalIterator():
            emit(row)
            n += 1
        return n

    def show_prolog_vars(self, out=None) -> int:
        """The REPL solution printer (show-prolog-vars/2,
        prolog-functors.lisp:510-518): one ``name = value`` line per
        selected var per solution; ``Yes`` per solution when the query
        selects no vars. Streams via toLocalIterator like run_io."""
        import sys
        out = out if out is not None else sys.stdout
        n = 0
        for row in self.to_df().toLocalIterator():
            if not self.vars:
                out.write("\nYes")
            else:
                for v in self.vars:
                    out.write(f"\n{v} = {row[var_col(v)]}")
            n += 1
        return n

    def foreach(self, fn) -> int:
        """``select :callback`` / ``do-query`` (prologc.lisp:1061-1083,
        prolog-functors.lisp:565-570): stream solutions to a driver-side
        callback without materializing the whole result — Rows arrive
        partition-by-partition via toLocalIterator. Returns the row count."""
        n = 0
        for row in self.to_df().toLocalIterator():
            fn(row)
            n += 1
        return n

    # -- goal compilation ------------------------------------------------------

    def compile_goals(self, plan: Plan, goals: list[tuple]) -> Plan:
        goals = list(goals)
        for i, g in enumerate(goals):
            if g == ("!",) or g == "!":
                # literal cut (prologc.lisp:709-714 compiles ! as a block
                # barrier): desugared to once over the goals PRECEDING it
                # in this block, under the documented ascending-bind
                # ordering contract (SURVEY §4.1(5)) — commit to the
                # first solution of the prefix, then continue with the
                # rest. A leading cut has an empty prefix: no-op.
                committed = self._g_once(plan, *goals[:i]) if i else plan
                return self.compile_goals(committed, goals[i + 1:])
        for goal in goals:
            plan = self.compile_goal(plan, goal)
        return plan

    def compile_goal(self, plan: Plan, goal: tuple) -> Plan:
        head, *args = goal
        if head == "^":
            # existential quantifier ('^', [?vars], goal...): compiles as its
            # body; the quantified vars only affect bagof/setof witness
            # inference (prolog-functors.lisp:398-411)
            return self.compile_goals(plan, list(args[1:]))
        handler = getattr(self, f"_g_{head.replace('-', '_')}", None)
        if handler is not None:
            return handler(plan, *args)
        if head in _CMP:
            return self._g_compare(plan, head, *args)
        if head in self.graph.edge_types():
            return self._g_edge_relation(plan, head, *args)
        if head in _USER_FUNCTORS:
            return Plan(_USER_FUNCTORS[head](self, plan, args))
        raise QueryError(f"unknown functor: {head}")

    # -- term resolution -------------------------------------------------------

    def resolve(self, plan: Plan, term: Any) -> Column:
        """Var -> its column (must be bound); literal -> lit."""
        if is_var(term):
            c = var_col(term)
            if c not in plan.bound:
                raise QueryError(f"unbound variable {term}")
            return F.col(c)
        return F.lit(term)

    def _arith(self, plan: Plan, expr: Any) -> Column:
        """Compile an ``is`` arithmetic expression tree: ('*', '?w', 2)."""
        if isinstance(expr, tuple):
            op, *operands = expr
            if op in _ARITH and len(operands) == 2:
                return _ARITH[op](self._arith(plan, operands[0]),
                                  self._arith(plan, operands[1]))
            fn = getattr(F, op, None)
            if fn is not None:
                return fn(*[self._arith(plan, o) for o in operands])
            raise QueryError(f"unknown arithmetic op: {op}")
        return self.resolve(plan, expr)

    # -- relation goals --------------------------------------------------------

    def _g_is_a(self, plan: Plan, node: Any, type_name: Any) -> Plan:
        """Type test / enumeration (prolog-functors.lisp:832-857): unbound ->
        subtype-closure scan; bound -> membership filter; type var -> project
        the type column."""
        if is_var(type_name):
            rel = self.graph.scan_vertices(
                include_deleted=self.include_deleted, columns=["id", "type"])
            rel = rel.select(F.col("id").alias(var_col(node)),
                             F.col("type").alias(var_col(type_name)))
            return plan.merge(rel, [var_col(node), var_col(type_name)])
        rel = self.graph.scan_vertices(
            type_name, include_deleted=self.include_deleted, columns=["id"])
        if is_var(node) and var_col(node) not in plan.bound:
            rel = rel.select(F.col("id").alias(var_col(node)))
            return plan.merge(rel, [var_col(node)])
        # bound node (or constant): semi-join membership test
        target = self.resolve(plan, node)
        if plan.df is None:
            return Plan(rel.filter(F.col("id") == target).select(
                F.col("id").alias(var_col(node)) if is_var(node) else F.col("id")))
        probe = rel.select(F.col("id").alias("__isa_id"))
        return Plan(plan.df.join(probe, on=target == F.col("__isa_id"),
                                 how="left_semi"))

    def _g_edge_relation(self, plan: Plan, etype: str, frm: Any, to: Any,
                         weight: Any = None) -> Plan:
        """Generated ``<edge-type>``/2,3 (schema.lisp:309-420): enumerate
        active edges of the type; bound endpoints become join keys/filters —
        the VEV/VE/type-index access paths collapse into Catalyst's join
        selection. Active-edge liveness per edge.lisp:275-284."""
        cols = ["src", "dst"] + (["weight"] if weight is not None else [])
        rel = self.graph.active_edges(etype, columns=cols)
        out_vars, conds = [], []
        for term, col in [(frm, "src"), (to, "dst")] + (
                [(weight, "weight")] if weight is not None else []):
            if is_var(term):
                v = var_col(term)
                rel = rel.withColumnRenamed(col, v)
                out_vars.append(v)
            else:
                conds.append(F.col(col) == F.lit(term))
        for c in conds:
            rel = rel.filter(c)
        rel = rel.select(*out_vars) if out_vars else rel.select(F.lit(1).alias("__one"))
        if not out_vars:
            # fully ground goal: existence test (edge-exists-p, edge.lisp:286-303)
            if plan.df is None:
                return Plan(rel.limit(1))
            return Plan(plan.df.join(F.broadcast(rel.limit(1)), how="cross"))
        return plan.merge(rel, out_vars)

    def _g_outgoing_edges(self, plan: Plan, v: Any, etype: str | None,
                          edge: Any, to: Any) -> Plan:
        """(outgoing-edges ?v etype ?e ?to) — prolog-functors.lisp:678-732."""
        return self._edge_with_id(plan, etype, v, to, edge)

    def _g_incoming_edges(self, plan: Plan, v: Any, etype: str | None,
                          edge: Any, frm: Any) -> Plan:
        """(incoming-edges ?v etype ?e ?from) — prolog-functors.lisp:635-676."""
        return self._edge_with_id(plan, etype, frm, v, edge)

    def _edge_with_id(self, plan: Plan, etype: str | None, frm: Any, to: Any,
                      edge: Any) -> Plan:
        rel = self.graph.active_edges(etype, columns=["id", "src", "dst"])
        out_vars = []
        for term, col in [(edge, "id"), (frm, "src"), (to, "dst")]:
            if is_var(term):
                v = var_col(term)
                rel = rel.withColumnRenamed(col, v)
                out_vars.append(v)
            else:
                rel = rel.filter(F.col(col) == F.lit(term))
        rel = rel.select(*out_vars)
        return plan.merge(rel, out_vars)

    def _g_node_slot_value(self, plan: Plan, node: Any, slot: str, value: Any) -> Plan:
        """Project a slot of a bound node (prolog-functors.lisp:791-805).
        Scans only the vertex types that declare the slot, so column pruning
        reaches the parquet readers."""
        types_with = [t.name for t in self.graph.registry.types("vertex")
                      if slot in t.slots and t.name in self.graph.vertex_types()]
        if not types_with:
            raise QueryError(f"no vertex type declares slot {slot!r}")
        rel = self.graph._union(self.graph._vertices, types_with,
                                self.include_deleted, ["id", slot])
        if not is_var(node):
            rel = rel.filter(F.col("id") == F.lit(node))
        node_v = var_col(node) if is_var(node) else "__node"
        rel = rel.withColumnRenamed("id", node_v)
        if is_var(value):
            rel = rel.withColumnRenamed(slot, var_col(value))
            return plan.merge(rel, [node_v, var_col(value)])
        rel = rel.filter(F.col(slot) == F.lit(value)).select(node_v)
        return plan.merge(rel, [node_v])

    _g_slot = _g_node_slot_value

    def _g_weight(self, plan: Plan, edge: Any, w: Any) -> Plan:
        """Edge weight accessor (prolog-functors.lisp:807-812)."""
        rel = self.graph.scan_edges(columns=["id", "weight"])
        rel = rel.withColumnRenamed("id", var_col(edge)) \
                 .withColumnRenamed("weight", var_col(w))
        return plan.merge(rel, [var_col(edge), var_col(w)])

    # -- filters / bindings ----------------------------------------------------

    def _g_compare(self, plan: Plan, op: str, a: Any, b: Any) -> Plan:
        """Numeric comparisons fail on non-numbers (prolog-functors.lisp:60-84);
        here the cast/filter semantics of Spark SQL apply (NULL -> drop)."""
        return Plan(plan.df.filter(_CMP[op](self.resolve(plan, a),
                                            self.resolve(plan, b))))

    def _g_eq(self, plan: Plan, a: Any, b: Any) -> Plan:
        """('=', a, b) unification (prolog-functors.lisp:48-50): bind an
        unbound var, else compare."""
        a_unbound = is_var(a) and var_col(a) not in plan.bound
        b_unbound = is_var(b) and var_col(b) not in plan.bound
        if a_unbound and b_unbound:
            raise QueryError("= with two unbound variables")
        if plan.df is None:
            # leading (= ?x const): bind on a unit relation
            var, const = (a, b) if a_unbound else (b, a)
            return Plan(self.graph.spark.range(1)
                        .select(F.lit(const).alias(var_col(var))))
        if a_unbound:
            return Plan(plan.df.withColumn(var_col(a), self.resolve(plan, b)))
        if b_unbound:
            return Plan(plan.df.withColumn(var_col(b), self.resolve(plan, a)))
        return Plan(plan.df.filter(self.resolve(plan, a) == self.resolve(plan, b)))

    def compile_goal_eq(self, plan, a, b):  # alias used by '=' dispatch
        return self._g_eq(plan, a, b)

    def _g_structural_eq(self, plan: Plan, a: Any, b: Any) -> Plan:
        """'==' — no binding (prolog-functors.lisp:52-54)."""
        return Plan(plan.df.filter(self.resolve(plan, a) == self.resolve(plan, b)))

    def _g_structural_neq(self, plan: Plan, a: Any, b: Any) -> Plan:
        """'/=' (prolog-functors.lisp:56-58)."""
        return Plan(plan.df.filter(self.resolve(plan, a) != self.resolve(plan, b)))

    def _g_regex_match(self, plan: Plan, pattern: str, s: Any) -> Plan:
        """cl-ppcre scan -> rlike (prolog-functors.lisp:133-139)."""
        return Plan(plan.df.filter(self.resolve(plan, s).rlike(pattern)))

    def _g_valid_date_p(self, plan: Plan, s: Any) -> Plan:
        """(prolog-functors.lisp:349-357) — YYYY-MM-DD validation."""
        c = self.resolve(plan, s)
        return Plan(plan.df.filter(
            c.rlike(r"^\d{4}-\d{2}-\d{2}$") & F.to_date(c, "yyyy-MM-dd").isNotNull()))

    def _g_not_in_list(self, plan: Plan, x: Any, items: list) -> Plan:
        """(prolog-functors.lisp:94-96)."""
        return Plan(plan.df.filter(~self.resolve(plan, x).isin(list(items))))

    def _g_is(self, plan: Plan, x: Any, expr: Any) -> Plan:
        """Arithmetic assign/unify (prolog-functors.lisp:98-116, 154-159).
        The reference's arbitrary-Lisp escape hatch becomes a restricted
        expression DSL kept JVM-side (no Python UDF in the hot path)."""
        val = self._arith(plan, expr)
        if is_var(x) and var_col(x) not in plan.bound:
            return Plan(plan.df.withColumn(var_col(x), val))
        return Plan(plan.df.filter(self.resolve(plan, x) == val))

    def _g_lispp(self, plan: Plan, expr: Any) -> Plan:
        """Boolean test (prolog-functors.lisp:118-124): expression must be
        truthy. Accepts an arithmetic tree or a SQL expression string.
        Requires the :eval effect like the reference's Lisp escape hatch."""
        self._require_effect("eval", "lispp")
        if isinstance(expr, str):
            return Plan(plan.df.filter(F.expr(expr)))
        return Plan(plan.df.filter(self._arith(plan, expr).cast("boolean")))

    def _g_lisp(self, plan: Plan, x: Any, expr: Any) -> Plan:
        """``(lisp ?x expr)`` (prolog-functors.lisp:98-116): bind ?x to the
        value of an arbitrary expression — the escape hatch. ``expr`` is a
        SQL expression string (JVM-side) or an arithmetic tree; arbitrary
        *Python* callables go through ``call`` + ``register_functor``."""
        self._require_effect("eval", "lisp")
        val = F.expr(expr) if isinstance(expr, str) else self._arith(plan, expr)
        if is_var(x) and var_col(x) not in plan.bound:
            if plan.df is None:
                return Plan(self.graph.spark.range(1)
                            .select(val.alias(var_col(x))))
            return Plan(plan.df.withColumn(var_col(x), val))
        return Plan(plan.df.filter(self.resolve(plan, x) == val))

    def _g_trigger(self, plan: Plan, expr: Any) -> Plan:
        """``trigger``/1 (prolog-functors.lisp:126-131): evaluate for effect,
        always succeed — the expression runs but never filters."""
        self._require_effect("eval", "trigger")
        val = F.expr(expr) if isinstance(expr, str) else self._arith(plan, expr)
        return Plan(plan.df.withColumn("__trigger", val).drop("__trigger"))

    def _g_retract(self, plan: Plan, node: Any, type_name: str) -> Plan:
        """``retract``/1 (prolog-functors.lisp:859-877): soft-delete every
        node bound to ``node`` in the current solutions. Requires the :write
        effect and a versioned (mutable) graph; applied eagerly as one batch
        commit — the set-oriented analog of per-solution retract."""
        self._require_effect("write", "retract")
        vg = getattr(self.graph, "versioned", None)
        if vg is None:
            raise QueryError("retract requires a VersionedGraph-backed store")
        ids = plan.df.select(F.col(var_col(node)).alias("id")).dropDuplicates()
        vg.commit(vg.begin().mark_deleted(type_name, ids))
        return plan

    def _g_param(self, plan: Plan, x: Any, name: str) -> Plan:
        """Bind from *query-params* (prolog-functors.lisp:144-152) — the safe
        parameter-injection surface of the REST layer (rest.lisp:59-99)."""
        if name not in self.params:
            raise QueryError(f"missing query param: {name}")
        val = F.lit(self.params[name])
        if plan.df is None:
            return Plan(self.graph.spark.range(1).select(val.alias(var_col(x))))
        return Plan(plan.df.withColumn(var_col(x), val))

    def _g_var(self, plan: Plan, x: Any) -> Plan:
        """var/1 (prolog-functors.lisp:141-142): true iff the argument is an
        unbound variable. In a static set-semantics plan, bound-ness is a
        compile-time property: a variable the preceding goals have not bound
        succeeds for every row (and stays unbound); a bound variable or a
        constant fails for every row."""
        if is_var(x) and (plan.df is None or var_col(x) not in plan.bound):
            return plan
        if plan.df is None:
            return Plan(self.graph.spark.range(1).filter(F.lit(False)))
        return Plan(plan.df.filter(F.lit(False)))

    def _g_numberp(self, plan: Plan, x: Any) -> Plan:
        """Type test (prolog-functors.lisp:86-88): value parses as a number.
        (Column types are static in Spark; the dynamic-typing analog is a
        cast-success test, which also matches string-typed slots.) try_cast,
        not cast: ANSI mode throws on malformed strings, but numberp must
        FILTER non-numbers, never error."""
        return Plan(plan.df.filter(
            self.resolve(plan, x).try_cast("double").isNotNull()))

    def _g_atom(self, plan: Plan, x: Any) -> Plan:
        """atom/1 (prolog-functors.lisp:90-92): bound non-compound value —
        non-null AND not an array/struct/map column (the compound-term
        analogs); a compound-typed variable fails for every row."""
        from pyspark.sql.types import ArrayType, MapType, StructType
        c = self.resolve(plan, x)
        if is_var(x) and plan.df is not None:
            dt = plan.df.schema[var_col(x)].dataType
            if isinstance(dt, (ArrayType, MapType, StructType)):
                return Plan(plan.df.filter(F.lit(False)))
        return Plan(plan.df.filter(c.isNotNull()))

    def _g_unique(self, plan: Plan, *vars_: str) -> Plan:
        """Per-variable dedup of solutions (prolog-functors.lisp:814-830)."""
        return Plan(plan.df.dropDuplicates([var_col(v) for v in vars_]))

    # -- control / set operators -----------------------------------------------

    def _g_not(self, plan: Plan, *goals: tuple) -> Plan:
        """Negation as failure (prologc.lisp:492-518): keep outer rows with no
        solution of the subgoals — an anti-join on the outer columns."""
        if plan.df is None:
            raise QueryError("'not' requires prior goals")
        sub = self.compile_goals(Plan(plan.df), list(goals))
        probe = sub.df.select(*plan.df.columns).dropDuplicates()
        return Plan(plan.df.join(probe, on=list(plan.df.columns), how="left_anti"))

    def _g_or(self, plan: Plan, *branches) -> Plan:
        """Disjunction = union of branch solution streams (prologc.lisp:432-447);
        bindings don't leak between branches. Vars bound in only some branches
        surface as NULL (≈ unbound) in the others."""
        plans = [self.compile_goals(Plan(plan.df), list(b)) for b in branches]
        out = plans[0].df
        for p in plans[1:]:
            out = out.unionByName(p.df, allowMissingColumns=True)
        return Plan(out)

    def _g_once(self, plan: Plan, *goals: tuple) -> Plan:
        """First solution per outer row (prologc.lisp:520-545). Requires a
        defined order for determinism: new columns sort ascending —
        the documented contract replacing the reference's discovery order."""
        if plan.df is None:
            # global once (no outer context): orderBy().limit(1) plans as
            # TakeOrderedAndProject — per-partition top-1 then merge,
            # map-side combinable — where a Window.partitionBy(lit(1))
            # row_number would route the whole intermediate through ONE
            # window task (VERDICT r8 finding 2)
            sub = self.compile_goals(Plan(), list(goals))
            new = sorted(sub.df.columns)
            return Plan(sub.df.orderBy(*new).limit(1))
        outer = list(plan.df.columns)
        sub = self.compile_goals(Plan(plan.df), list(goals))
        new = sorted(set(sub.df.columns) - set(outer))
        from pyspark.sql import Window as W
        w = W.partitionBy(*outer).orderBy(*new) if new else W.partitionBy(*outer).orderBy(F.lit(1))
        return Plan(sub.df.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1).drop("__rn"))

    def _g_if(self, plan: Plan, cond: list, then: list, els: list | None = None) -> Plan:
        """Soft-cut ``(if C T E)`` (prologc.lisp:546-569): outer rows where C
        has >= 1 solution flow through (C, T); the others flow through E —
        never both. Set-oriented: the commit is per outer row, which is the
        reference's semantics lifted from tuples to row groups."""
        if plan.df is None:
            plan = Plan(self.graph.spark.range(1).select(F.lit(1).alias("__unit")))
        outer_cols = list(plan.df.columns)
        cond_plan = self.compile_goals(Plan(plan.df), list(cond))
        sat = cond_plan.df.select(*outer_cols).dropDuplicates()
        then_df = self.compile_goals(Plan(cond_plan.df), list(then)).df
        if els is None:
            out = then_df
        else:
            unsat = plan.df.join(sat, on=outer_cols, how="left_anti")
            else_df = self.compile_goals(Plan(unsat), list(els)).df
            out = then_df.unionByName(else_df, allowMissingColumns=True)
        if "__unit" in out.columns:
            out = out.drop("__unit")
        return Plan(out)

    def _g_forall(self, plan: Plan, cond: list, action: list) -> Plan:
        """forall(Cond, Action) (prologc.lisp:571-582): succeeds iff every
        Cond solution satisfies Action — anti-join emptiness per outer row."""
        if plan.df is None:
            plan = Plan(self.graph.spark.range(1).select(F.lit(1).alias("__all")))
        cond_plan = self.compile_goals(Plan(plan.df), list(cond))
        violating = self._g_not(Plan(cond_plan.df), *action)
        # outer rows with >=1 violating Cond solution fail
        bad = violating.df.select(*plan.df.columns).dropDuplicates()
        out = plan.df.join(bad, on=list(plan.df.columns), how="left_anti")
        return Plan(out.drop("__all") if "__all" in out.columns else out)

    # -- aggregates (findall/bagof/setof, prolog-functors.lisp:413-508) ---------

    @classmethod
    def _collect_vars(cls, obj: Any, acc: list, quantified: set) -> None:
        """First-occurrence-ordered variables of a goal tree. A ('^', [vars],
        goal...) node adds its quantifier list to ``quantified`` and recurses
        into only the body (prolog-functors.lisp:398-411)."""
        if is_var(obj):
            if obj not in acc:
                acc.append(obj)
        elif isinstance(obj, (list, tuple)):
            if (isinstance(obj, tuple) and len(obj) >= 2 and obj[0] == "^"):
                qvars = obj[1] if isinstance(obj[1], (list, tuple)) else [obj[1]]
                quantified.update(q for q in qvars if is_var(q))
                for sub in obj[2:]:
                    cls._collect_vars(sub, acc, quantified)
            else:
                for sub in obj:
                    cls._collect_vars(sub, acc, quantified)

    @classmethod
    def _infer_witness(cls, template: Any, goals: list) -> list:
        """bagof/setof witness vars = free vars of the goal list minus the
        template minus ^-quantified (prolog-functors.lisp:479-496), in first-
        occurrence order."""
        tmpl = {template} if is_var(template) else set(template)
        acc: list = []
        quantified: set = set()
        cls._collect_vars(list(goals), acc, quantified)
        return [v for v in acc if v not in tmpl and v not in quantified]

    def _agg_goal(self, plan: Plan, template: Any, goals: list, out: str,
                  *, witness: list | None, fail_on_empty: bool,
                  sort_unique: bool, lenient_witness: bool = False) -> Plan:
        tmpl_vars = [template] if is_var(template) else list(template)
        tmpl_cols = [var_col(v) for v in tmpl_vars]
        sub = self.compile_goals(Plan(plan.df), list(goals))
        if witness is not None:
            group_cols = [var_col(v) for v in witness]
            if lenient_witness:
                # inferred witnesses may include vars local to nested
                # aggregates that never surface as sub-plan columns
                group_cols = [c for c in group_cols if c in sub.df.columns]
            # outer-bound vars always refine the grouping: the sub-plan
            # replicates subgoal solutions per outer row, so dropping an
            # outer key from the group would mix bags across outer rows
            group_cols += [c for c in plan.bound if c not in group_cols]
        else:
            group_cols = list(plan.bound)
        tmpl_expr = (F.col(tmpl_cols[0]) if len(tmpl_cols) == 1
                     else F.struct(*[F.col(c) for c in tmpl_cols]))
        agg = F.collect_list(tmpl_expr)
        if sort_unique:
            # setof: sort by standard order of terms + dedup
            # (prolog-functors.lisp:437-470)
            agg = F.array_sort(F.array_distinct(F.collect_set(tmpl_expr)))
        else:
            # findall/bagof order is discovery order (unspecified by contract);
            # sort for a deterministic Spark contract (SURVEY.md §7.3).
            agg = F.array_sort(F.collect_list(tmpl_expr))
        if not group_cols:
            grouped = sub.df.agg(agg.alias(var_col(out)))
            return Plan(grouped if plan.df is None
                        else plan.df.crossJoin(F.broadcast(grouped)))
        grouped = sub.df.groupBy(*group_cols).agg(agg.alias(var_col(out)))
        if plan.df is None:
            return Plan(grouped)
        keep = [c for c in group_cols if c in plan.bound]
        how = "inner" if fail_on_empty else "left"
        # new (not-outer-bound) witness vars surface as bound vars in the
        # solutions, as in the reference (one solution per witness binding)
        if keep:
            joined = plan.df.join(grouped.select(*group_cols, var_col(out)),
                                  on=keep, how=how)
        else:
            joined = plan.df.crossJoin(
                grouped.select(*group_cols, var_col(out)))
        if not fail_on_empty:
            # findall yields [] when Goal has no solutions
            # (prolog-functors.lisp:413-422)
            elem = grouped.schema[var_col(out)].dataType
            joined = joined.withColumn(
                var_col(out),
                F.coalesce(F.col(var_col(out)), F.lit(None).cast(elem),
                           F.array().cast(elem)))
        return Plan(joined)

    def _g_fail(self, plan: Plan) -> Plan:
        """fail/0 (prolog-functors.lisp): zero solutions — the empty plan.
        Useful with ``or``/``if`` branches."""
        if plan.df is None:
            return Plan(self.graph.spark.range(0).select(
                F.lit(1).alias("__unit")))
        return Plan(plan.df.filter(F.lit(False)))

    def _g_repeat(self, plan: Plan) -> Plan:
        """repeat/0: in the reference an infinite choice point driving
        side-effect loops. Set semantics has no incremental backtracking to
        drive, so repeat degenerates to a no-op (one solution per outer
        row) — documented reinterpretation, kept for goal-list
        compatibility."""
        return plan if plan.df is not None else Plan(
            self.graph.spark.range(1).select(F.lit(1).alias("__unit")))

    def _unit_plan(self, plan: Plan) -> Plan:
        return plan if plan.df is not None else Plan(
            self.graph.spark.range(1).select(F.lit(1).alias("__unit")))

    def _g_write(self, plan: Plan, term: Any) -> Plan:
        """write/1 (prolog-functors.lisp:30-32): print the term per
        solution. Declarative reinterpretation: the plan is untouched; the
        action is recorded and replayed by ``run_io`` once per result row
        (the Select.foreach top-level). :io-gated like the reference."""
        self._require_effect("io", "write")
        if is_var(term) and var_col(term) not in plan.bound:
            raise QueryError(f"write of unbound variable {term}")
        self._io_actions.append(("write", term))
        return self._unit_plan(plan)

    def _g_nl(self, plan: Plan) -> Plan:
        """nl/0 (prolog-functors.lisp:34-36): newline per solution via
        run_io."""
        self._require_effect("io", "nl")
        self._io_actions.append(("nl", None))
        return self._unit_plan(plan)

    def _g_read(self, plan: Plan, term: Any) -> Plan:
        """read/1 (prolog-functors.lisp:26-28): unify with a term from the
        input stream. Set-semantics reinterpretation: ONE term is consumed
        from the Select's ``io_input`` at plan build and bound/tested
        across all solutions (there is no per-solution prompting in a
        declarative plan). Input terms are Python literals."""
        self._require_effect("io", "read")
        if self.io_input is None:
            raise QueryError("read/1 needs Select(io_input=...)")
        try:
            value = next(self.io_input)
        except StopIteration:
            raise QueryError("read/1: input stream exhausted") from None
        if is_var(term) and var_col(term) not in plan.bound:
            base = self._unit_plan(plan)
            return Plan(base.df.withColumn(var_col(term), F.lit(value)))
        # bound var / constant: unification degenerates to an equality test
        return Plan(self._unit_plan(plan).df.filter(
            self.resolve(plan, term) == F.lit(value)))

    def _g_throw(self, plan: Plan, ball: Any) -> Plan:
        """throw(Ball) (prolog-functors.lisp:258-268). In a declarative plan
        there is no per-tuple control flow: a reachable throw aborts plan
        construction with the (plan-time-bound) ball, to be fielded by an
        enclosing catch goal. An unbound ball is an error, as in the
        reference."""
        if is_var(ball):
            raise QueryError("throw of an uninstantiated ball")
        raise PrologThrow(ball)

    def _g_catch(self, plan: Plan, goals: list, catcher: Any,
                 recovery: list) -> Plan:
        """catch(Goal, Catcher, Recovery) (prolog-functors.lisp:270-...):
        build the Goal subplan; if construction throws a ball that matches
        Catcher (a var catches anything, a constant catches an equal ball),
        build Recovery against the same incoming plan instead. Non-matching
        balls propagate to an outer catch. Spark-first reinterpretation:
        the reference's main catchable class — eval errors from lisp/is —
        surfaces at ANALYSIS time here (bad expressions fail plan
        construction), so catching at plan-build time covers the same
        errors one query-compilation earlier. Resource/permission errors
        (EffectNotAllowed) are deliberately NOT catchable, matching the
        reference's uncatchable-permission-error rule.

        EXECUTION-time throws (a UDF raising PrologThrow mid-job, the
        reference's run-time error class) are ALSO fielded: each compiled
        catch registers a frame keyed by the identity of its Goal list
        (stable across recompiles of the same Select), and
        Select._execute re-plans with this catch forced into its Recovery
        branch when a matching ball surfaces from a running job."""
        key = id(goals)
        self._catch_frames.append((key, catcher))
        if key in self._forced_recovery:
            return self._recovery_plan(plan, catcher, recovery,
                                       self._forced_recovery[key])
        try:
            sub = self.compile_goals(Plan(plan.df), list(goals))
            # force analysis so expression errors surface inside the catch
            if sub.df is not None:
                sub.df.schema
            return sub
        except EffectNotAllowed:
            raise
        except PrologThrow as ex:
            if not (is_var(catcher) or catcher == ex.ball):
                raise
            ball = ex.ball
        except QueryError:
            raise
        except Exception:
            # analysis-time failure of the goal body (the lisp/is class)
            if not is_var(catcher):
                raise
            ball = None
        return self._recovery_plan(plan, catcher, recovery, ball)

    def _recovery_plan(self, plan: Plan, catcher: Any, recovery: list,
                       ball: Any) -> Plan:
        base = plan.df
        if is_var(catcher) and ball is not None:
            # Ball unifies with Catcher BEFORE Recovery runs (ISO catch/3):
            # bind it onto the incoming plan so recovery goals can reference
            # the catcher variable (inspect / compare / re-throw on it).
            # Compound balls (tuples/lists) become array literals.
            lit = (F.array(*[F.lit(x) for x in ball])
                   if isinstance(ball, (tuple, list)) else F.lit(ball))
            if base is None:
                base = self.graph.spark.range(1).select(
                    lit.alias(var_col(catcher)))
            else:
                base = base.withColumn(var_col(catcher), lit)
        return self.compile_goals(Plan(base), list(recovery))

    def _g_findall(self, plan: Plan, template, goals, out) -> Plan:
        return self._agg_goal(plan, template, goals, out, witness=None,
                              fail_on_empty=False, sort_unique=False)

    def _g_bagof(self, plan: Plan, template, goals, out, witness=None) -> Plan:
        """bagof groups by witness variables — the free vars of Goal outside
        the template minus ^-quantified ones, inferred exactly as the
        reference does (prolog-functors.lisp:479-496); mark quantified vars
        with ('^', [?vars], goal...) inside the goal list. An explicit
        ``witness`` list overrides inference. Fails (drops rows) on empty
        groups."""
        if witness is None:
            witness = self._infer_witness(template, goals)
            return self._agg_goal(plan, template, goals, out, witness=witness,
                                  fail_on_empty=True, sort_unique=False,
                                  lenient_witness=True)
        return self._agg_goal(plan, template, goals, out, witness=witness,
                              fail_on_empty=True, sort_unique=False)

    def _g_setof(self, plan: Plan, template, goals, out, witness=None) -> Plan:
        """setof = bagof + sort + dedup (prolog-functors.lisp:505-508); same
        witness inference / ^-quantifier rules as bagof."""
        if witness is None:
            witness = self._infer_witness(template, goals)
            return self._agg_goal(plan, template, goals, out, witness=witness,
                                  fail_on_empty=True, sort_unique=True,
                                  lenient_witness=True)
        return self._agg_goal(plan, template, goals, out, witness=witness,
                              fail_on_empty=True, sort_unique=True)

    # -- view invocation (wired in views.py) ------------------------------------

    def _g_invoke_view(self, plan: Plan, class_name: str, view_name: str,
                       key: Any, node: Any, value: Any = None) -> Plan:
        """Join against a materialized view (prolog-functors.lisp:734-767)."""
        from vivace_graph_v3_spark.views import get_view
        view = get_view(class_name, view_name)
        rel = view.materialize(self.graph)
        out_vars = []
        for term, col in [(key, "key"), (node, "id")] + (
                [(value, "value")] if value is not None else []):
            if is_var(term):
                rel = rel.withColumnRenamed(col, var_col(term))
                out_vars.append(var_col(term))
            else:
                rel = rel.filter(F.col(col) == F.lit(term))
        rel = rel.select(*out_vars)
        return plan.merge(rel, out_vars)

    def _g_invoke_reduced_view(self, plan: Plan, class_name: str, view_name: str,
                               key: Any, value: Any) -> Plan:
        """Join against per-key aggregates (prolog-functors.lisp:769-789)."""
        from vivace_graph_v3_spark.views import get_view
        view = get_view(class_name, view_name)
        rel = view.reduced(self.graph)
        out_vars = []
        for term, col in [(key, "key"), (value, "value")]:
            if is_var(term):
                rel = rel.withColumnRenamed(col, var_col(term))
                out_vars.append(var_col(term))
            else:
                rel = rel.filter(F.col(col) == F.lit(term))
        rel = rel.select(*out_vars)
        return plan.merge(rel, out_vars)

    def _g_call(self, plan: Plan, functor: str, *args) -> Plan:
        """Meta-call of a registered functor (prologc.lisp:584-606)."""
        if functor not in _USER_FUNCTORS:
            raise QueryError(f"unregistered functor: {functor}")
        return Plan(_USER_FUNCTORS[functor](self, plan, args))

    # -- geo predicates (prolog-functors.lisp:929-954) --------------------------

    def _haversine(self, plan: Plan, lat1, lon1, lat2, lon2) -> Column:
        from vivace_graph_v3_spark.functions.geometry import haversine_m
        return haversine_m(*(self.resolve(plan, t).cast("double")
                             for t in (lat1, lon1, lat2, lon2)))

    def _g_geo_distance(self, plan: Plan, lat1, lon1, lat2, lon2, dist) -> Plan:
        """(geo-distance lat1 lon1 lat2 lon2 ?d): bind/compare geodesic
        meters over bound coordinates (prolog-functors.lisp:929-936)."""
        d = self._haversine(plan, lat1, lon1, lat2, lon2)
        if is_var(dist) and var_col(dist) not in plan.bound:
            return Plan(plan.df.withColumn(var_col(dist), d))
        return Plan(plan.df.filter(self.resolve(plan, dist) == d))

    def _g_geo_near(self, plan: Plan, lat, lon, lat0, lon0, radius) -> Plan:
        """(geo-near ?lat ?lon lat0 lon0 radius-m) — filter within radius
        (prolog-functors.lisp:938-945). A bbox prefilter keeps the expensive
        trig off most rows and stays pushdown-friendly."""
        d = self._haversine(plan, lat, lon, lat0, lon0)
        r = self.resolve(plan, radius).cast("double")
        lat_c, lon_c = (self.resolve(plan, t).cast("double") for t in (lat, lon))
        lat0_c, lon0_c = (self.resolve(plan, t).cast("double")
                          for t in (lat0, lon0))
        deg = r / F.lit(111_320.0)  # meters per degree latitude
        lon_deg = deg / F.greatest(F.cos(F.radians(lat0_c)), F.lit(1.0e-6))
        bbox = (F.abs(lat_c - lat0_c) <= deg) & (F.abs(lon_c - lon0_c) <= lon_deg)
        return Plan(plan.df.filter(bbox & (d <= r)))

    def _g_geo_within(self, plan: Plan, lat, lon, polygon) -> Plan:
        """(geo-within ?lat ?lon polygon) — point-in-polygon refine
        (prolog-functors.lisp:947-954); bbox prefilter + ray-casting UDF."""
        from vivace_graph_v3_spark.functions.geometry import (
            point_in_polygon_udf, polygon_bbox)
        lat_min, lat_max, lon_min, lon_max = polygon_bbox(polygon)
        lat_c = self.resolve(plan, lat).cast("double")
        lon_c = self.resolve(plan, lon).cast("double")
        bbox = (lat_c.between(lat_min, lat_max) & lon_c.between(lon_min, lon_max))
        return Plan(plan.df.filter(bbox & point_in_polygon_udf(polygon)(lat_c, lon_c)))


# '=' '==' '/=' need non-identifier dispatch:
Select._g_dispatch_overrides = {"=": "_g_eq", "==": "_g_structural_eq",
                                "/=": "_g_structural_neq"}
_orig_compile_goal = Select.compile_goal


def _compile_goal(self, plan, goal):
    head = goal[0]
    override = Select._g_dispatch_overrides.get(head)
    if override:
        return getattr(self, override)(plan, *goal[1:])
    return _orig_compile_goal(self, plan, goal)


Select.compile_goal = _compile_goal


def select(graph: GraphStore, vars: list[str], goals: list[tuple], **opts) -> DataFrame:
    """Functional form: ``select(g, ['?a','?b'], [('is-a','?a','person'), ...])``."""
    return Select(graph, vars, goals, **opts).to_df()


def select_flat(graph, var: str, goals, **opts) -> DataFrame:
    """select-flat (prologc.lisp:1039-1042): single-var projection."""
    return select(graph, [var], goals, **opts)


def select_count(graph, goals, **opts) -> int:
    """select-count (prologc.lisp:1044-1049)."""
    row = Select(graph, [], goals, **opts)
    plan = row.compile_goals(Plan(), row.goals)
    return plan.df.count()


def select_first(graph, vars, goals, order_by=None, **opts):
    """select-first (prologc.lisp:1051-1059) under an explicit order."""
    return select(graph, vars, goals, order_by=order_by or vars, limit=1, **opts)


def _noop(*_a, **_k):  # placeholder referenced by docs/tests
    return None


_ = fnmatch  # (imported for future glob-style functor patterns)
