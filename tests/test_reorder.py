"""Tests for the connectivity-aware goal pre-ordering pass
(query/reorder.py): pure-function properties, plan-level cartesian
avoidance, and result invariance under goal permutations."""

import itertools

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, rows_set
from vivace_graph_v3_spark.query import select
from vivace_graph_v3_spark.query.builder import Select
from vivace_graph_v3_spark.query.reorder import goal_vars, reorder_goals
from vivace_graph_v3_spark.plans import plan_facts


IS_EDGE = lambda h: h in {"placed", "contains", "in_nation", "in_region"}


class TestReorderFunction:
    def test_identity_on_connected_order(self):
        goals = [
            ("is-a", "?c", "customer"),
            ("placed", "?c", "?o"),
            ("contains", "?o", "?p", "?w"),
            (">", "?w", 10),
        ]
        assert reorder_goals(goals, IS_EDGE) == goals

    def test_disconnected_goal_deferred(self):
        goals = [
            ("is-a", "?c", "customer"),
            ("contains", "?o", "?p", "?w"),     # disconnected from ?c here
            ("placed", "?c", "?o"),             # ...this connects them
        ]
        got = reorder_goals(goals, IS_EDGE)
        assert got == [
            ("is-a", "?c", "customer"),
            ("placed", "?c", "?o"),
            ("contains", "?o", "?p", "?w"),
        ]

    def test_filter_pulled_to_earliest_satisfiable_point(self):
        goals = [
            ("placed", "?c", "?o"),
            ("contains", "?o", "?p", "?w"),
            (">", "?w", 10),                    # already earliest-satisfiable
        ]
        assert reorder_goals(goals, IS_EDGE) == goals
        goals2 = [
            ("placed", "?c", "?o"),
            (">", "?w", 10),                    # ?w unbound here...
            ("contains", "?o", "?p", "?w"),     # ...bound here
        ]
        got = reorder_goals(goals2, IS_EDGE)
        assert got == [
            ("placed", "?c", "?o"),
            ("contains", "?o", "?p", "?w"),
            (">", "?w", 10),
        ]

    def test_barriers_never_crossed(self):
        goals = [
            ("contains", "?o", "?p", "?w"),
            ("is", "?x", ("*", "?w", 2)),       # barrier: binding
            ("placed", "?c", "?o"),
            ("is-a", "?c", "customer"),
        ]
        got = reorder_goals(goals, IS_EDGE)
        # the two runs re-order internally but the barrier stays put and
        # nothing moves across it
        assert got[0] == ("contains", "?o", "?p", "?w")
        assert got[1] == ("is", "?x", ("*", "?w", 2))
        assert set(got[2:]) == {("placed", "?c", "?o"),
                                ("is-a", "?c", "customer")}

    def test_unknown_heads_are_barriers(self):
        goals = [("mystery", "?a"), ("is-a", "?c", "customer")]
        assert reorder_goals(goals, IS_EDGE) == goals

    def test_goal_vars_flat_only(self):
        assert goal_vars(("is", "?x", ("*", "?w", 2))) == {"?x"}
        assert goal_vars(("placed", "?c", "?o")) == {"?c", "?o"}


class TestReorderInPlans:
    def test_disconnected_order_avoids_cartesian(self, tpch, spark):
        goals_bad = [
            ("is-a", "?c", "customer"),
            ("contains", "?o", "?p", "?w"),
            ("placed", "?c", "?o"),
        ]
        with_r = select(tpch, ["?c", "?p"], goals_bad)
        with_r.collect()
        assert plan_facts(with_r).cartesian_products == 0
        # Catalyst's ReorderJoin also rescues this particular shape at the
        # physical level (measured; see reorder.py docstring) — the pass
        # guarantees it at the logical level. Both must be cartesian-free.
        without = select(tpch, ["?c", "?p"], goals_bad, reorder=False)
        without.collect()
        assert plan_facts(without).cartesian_products == 0

    def test_results_equal_with_and_without(self, tpch):
        goals = [
            ("is-a", "?c", "customer"),
            ("contains", "?o", "?p", "?w"),
            ("placed", "?c", "?o"),
            (">", "?w", 40),
        ]
        a = rows_set(select(tpch, ["?c", "?p", "?w"], goals))
        b = rows_set(select(tpch, ["?c", "?p", "?w"], goals, reorder=False))
        assert a == b and len(a) > 0

    def test_all_permutations_agree(self, tpch):
        base = [
            ("is-a", "?c", "customer"),
            ("placed", "?c", "?o"),
            ("in_nation", "?c", "?n"),
        ]
        expect = rows_set(select(tpch, ["?o", "?n"], base))
        assert len(expect) > 0
        for perm in itertools.permutations(base):
            got = rows_set(select(tpch, ["?o", "?n"], list(perm)))
            assert got == expect, perm
