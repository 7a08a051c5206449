"""Connectivity-aware goal pre-ordering — the builder-level planning pass
Catalyst does not do for us.

The reference executes goals in written order (its goal order IS its
execution order, prologc.lisp:702-734); the Spark builder compiles them
left-to-right into a join tree. Catalyst pushes FILTERS through that tree
for free, but it does NOT re-order inner JOINS without CBO statistics —
so a goal list whose adjacent goals share no variable compiles to a
CartesianProduct even when a later goal would have connected them:

    [(is-a ?c customer), (contains ?o ?p ?w), (placed ?c ?o)]
                           ^ disconnected from ?c at merge time

Measured caveat, recorded for honesty: Catalyst's ReorderJoin rule DOES
flatten a run of consecutive inner/cross Join nodes and re-orders them so
every join gets a condition — so for plain relational runs the physical
plan usually avoids the CartesianProduct even without this pass. The pass
still earns its place as a compile-level GUARANTEE rather than an
optimizer heuristic: it holds independent of Catalyst internals, of
semi-join fast paths (bound ``is-a`` merges LEFT SEMI, which breaks the
flattenable join chain), and of future operators interleaved between
merges — and it keeps the LOGICAL plan readable (explain shows the
connected order the author should have written).

This pass greedily re-orders each run of ORDER-COMMUTATIVE goals so the
join graph stays connected whenever the goal list permits, and pulls
already-satisfiable filters ahead of further relations:

  1. earliest filter goal whose variables are all bound  (shrink rows)
  2. else earliest relational goal sharing a bound variable (connected
     join — never a cartesian while one is avoidable)
  3. else the earliest remaining goal (genuinely disconnected conjunction:
     the cartesian is semantically required, keep the written order)

Soundness: only RELATIONAL goals (vertex/edge/slot enumerations — inner
joins of multisets, commutative and associative; the bound-var fast paths
are semi-joins against UNIQUE-id scans, so multiplicity is unaffected)
and pure FILTER goals (satisfiable only once their vars are bound — in
any working program that is at their written position at the latest) are
moved, and only within a RUN: anything order-sensitive (unification `=`,
`is` bindings, negation, disjunction, cut/once, aggregation, I/O,
user functors — anything not allowlisted) is a BARRIER that goals never
cross, so every barrier still sees exactly the bound-variable set its
written position implies. A well-ordered goal list re-orders to itself;
the pass is identity on already-connected programs.
"""

from __future__ import annotations

from typing import Any, Callable

# goal heads whose handlers merge a relation (inner join / unique-id
# semi-join) — order-commutative under multiset semantics
RELATIONAL_HEADS = frozenset({
    "is-a", "outgoing-edges", "incoming-edges",
    "slot", "node-slot-value", "weight",
})

# pure row filters over bound variables
FILTER_HEADS = frozenset({
    "<", ">", "<=", ">=", "==", "/=",
    "regex-match", "valid-date-p", "not-in-list",
})


def _is_var(term: Any) -> bool:
    return isinstance(term, str) and term.startswith("?")


def goal_vars(goal: tuple) -> frozenset:
    """The ?variables appearing (flat) in a goal's arguments."""
    return frozenset(a for a in goal[1:] if _is_var(a))


def reorder_goals(goals: list[tuple],
                  is_edge_type: Callable[[str], bool]) -> list[tuple]:
    """Re-order ``goals`` per the module contract. ``is_edge_type``
    classifies dynamic ``<edge-type>``/2,3 relation heads (schema-owned,
    so injected by the caller)."""
    def kind(g: tuple) -> str:
        head = g[0]
        if not isinstance(head, str):
            return "barrier"
        if head in RELATIONAL_HEADS or is_edge_type(head):
            return "relational"
        if head in FILTER_HEADS:
            return "filter"
        return "barrier"

    out: list[tuple] = []
    bound: set[str] = set()
    run: list[tuple] = []

    def flush_run() -> None:
        remaining = list(run)
        run.clear()
        while remaining:
            pick = None
            for g in remaining:                      # 1. satisfied filter
                if kind(g) == "filter" and goal_vars(g) <= bound:
                    pick = g
                    break
            if pick is None:                         # 2. connected relation
                for g in remaining:
                    if kind(g) == "relational" and (
                            not bound or goal_vars(g) & bound):
                        pick = g
                        break
            if pick is None:                         # 3. written order
                pick = remaining[0]
            remaining.remove(pick)
            out.append(pick)
            bound.update(goal_vars(pick))

    for g in goals:
        if kind(g) == "barrier":
            flush_run()
            out.append(g)
            bound.update(goal_vars(g))
        else:
            run.append(g)
    flush_run()
    return out
