"""Query-builder semantics vs a DuckDB oracle on the same parquet.

Mirrors the reference's tests/query-tests.lisp (select/count/limit/skip/joins)
and tests/prolog-functor-tests.lisp (comparisons, regex, not, or, unique,
findall/bagof/setof, forall) over the F6 TPC-H graph projection.
"""

from pyspark.sql import functions as F

from tests.conftest import rows_set, duck_set
from vivace_graph_v3_spark.query.builder import (
    Select, select, select_count, select_first)


def test_is_a_scan(tpch, duck):
    df = select(tpch, ["?c"], [("is-a", "?c", "customer")])
    want = duck_set(duck, "SELECT 'customer:'||c_custkey FROM customer")
    assert rows_set(df) == want


def test_edge_join_conjunction(tpch, duck):
    # (in_nation ?c ?n) ∧ (in_region ?n ?r): 2-hop join, bindings flow left->right
    df = select(tpch, ["?c", "?r"], [
        ("is-a", "?c", "customer"),
        ("in_nation", "?c", "?n"),
        ("in_region", "?n", "?r"),
    ])
    want = duck_set(duck, """
        SELECT 'customer:'||c_custkey, 'region:'||n_regionkey
        FROM customer JOIN nation ON c_nationkey=n_nationkey
    """)
    assert rows_set(df) == want


def test_weighted_edge_and_comparison(tpch, duck):
    df = select(tpch, ["?o", "?p", "?w"], [
        ("contains", "?o", "?p", "?w"),
        (">", "?w", 45.0),
    ])
    want = duck_set(duck, """
        SELECT 'orders:'||l_orderkey, 'part:'||l_partkey, l_quantity
        FROM lineitem WHERE l_quantity > 45.0
    """)
    assert rows_set(df) == want


def test_node_slot_value(tpch, duck):
    df = select(tpch, ["?c", "?b"], [
        ("is-a", "?c", "customer"),
        ("slot", "?c", "c_acctbal", "?b"),
        (">", "?b", 5000.0),
    ])
    want = duck_set(duck, """
        SELECT 'customer:'||c_custkey, c_acctbal FROM customer
        WHERE c_acctbal > 5000.0
    """)
    assert rows_set(df) == want


def test_regex_match(tpch, duck):
    df = select(tpch, ["?c", "?n"], [
        ("is-a", "?c", "customer"),
        ("slot", "?c", "c_name", "?n"),
        ("regex-match", "0{2}$", "?n"),
    ])
    want = duck_set(duck, """
        SELECT 'customer:'||c_custkey, c_name FROM customer
        WHERE regexp_matches(c_name, '0{2}$')
    """)
    assert rows_set(df) == want


def test_not_negation_as_failure(tpch, duck):
    # customers with no orders
    df = select(tpch, ["?c"], [
        ("is-a", "?c", "customer"),
        ("not", ("placed", "?c", "?o")),
    ])
    want = duck_set(duck, """
        SELECT 'customer:'||c_custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey)
    """)
    assert rows_set(df) == want


def test_or_union(tpch, duck):
    df = select(tpch, ["?c"], [
        ("is-a", "?c", "customer"),
        ("or",
         [("slot", "?c", "c_mktsegment", "BUILDING")],
         [("slot", "?c", "c_mktsegment", "MACHINERY")]),
    ], distinct=True)
    want = duck_set(duck, """
        SELECT DISTINCT 'customer:'||c_custkey FROM customer
        WHERE c_mktsegment IN ('BUILDING','MACHINERY')
    """)
    assert rows_set(df) == want


def test_unique(tpch, duck):
    df = select(tpch, ["?n"], [
        ("in_nation", "?c", "?n"),
        ("unique", "?n"),
    ])
    want = duck_set(duck,
                    "SELECT DISTINCT 'nation:'||c_nationkey FROM customer")
    assert rows_set(df) == want


def test_select_count_limit_skip(tpch, duck):
    n = select_count(tpch, [("is-a", "?c", "customer")])
    (want,) = duck.execute("SELECT count(*) FROM customer").fetchone()
    assert n == want
    # deterministic limit/skip under explicit order
    df = select(tpch, ["?c"], [("is-a", "?c", "customer")],
                order_by=["?c"], limit=5, skip=2)
    want = duck_set(duck, """
        SELECT id FROM (SELECT 'customer:'||c_custkey AS id FROM customer)
        ORDER BY id LIMIT 5 OFFSET 2
    """)
    assert rows_set(df) == want


def test_select_first(tpch, duck):
    df = select_first(tpch, ["?c"], [("is-a", "?c", "customer")])
    rows = df.collect()
    assert len(rows) == 1
    (want,) = duck.execute(
        "SELECT min('customer:'||c_custkey) FROM customer").fetchone()
    assert rows[0][0] == want


def test_is_arithmetic(tpch, duck):
    df = select(tpch, ["?o", "?dbl"], [
        ("contains", "?o", "?p", "?w"),
        (">", "?w", 49.0),
        ("is", "?dbl", ("*", "?w", 2)),
    ])
    want = duck_set(duck, """
        SELECT 'orders:'||l_orderkey, l_quantity*2
        FROM lineitem WHERE l_quantity > 49.0
    """)
    assert rows_set(df) == want


def test_findall_empty_list(tpch, duck):
    # per-customer order totals; customers without orders get []
    df = select(tpch, ["?c", "?totals"], [
        ("is-a", "?c", "customer"),
        ("findall", "?t",
         [("placed", "?c", "?o"), ("slot", "?o", "o_totalprice", "?t")],
         "?totals"),
    ])
    want = duck_set(duck, """
        SELECT 'customer:'||c_custkey,
               coalesce(list(o_totalprice ORDER BY o_totalprice)
                        FILTER (WHERE o_totalprice IS NOT NULL),
                        CAST([] AS DOUBLE[])) AS totals
        FROM customer LEFT JOIN orders ON o_custkey=c_custkey
        GROUP BY 1
    """)
    assert rows_set(df) == want


def test_bagof_fails_on_empty(tpch, duck):
    df = select(tpch, ["?n", "?custs"], [
        ("is-a", "?n", "nation"),
        ("bagof", "?c", [("in_nation", "?c", "?n")], "?custs", ["?n"]),
    ])
    want = duck_set(duck, """
        SELECT 'nation:'||c_nationkey,
               list('customer:'||c_custkey ORDER BY 'customer:'||c_custkey)
        FROM customer GROUP BY 1
    """)
    assert rows_set(df) == want


def test_setof_sorted_dedup(tpch, duck):
    df = select(tpch, ["?n", "?segs"], [
        ("is-a", "?n", "nation"),
        ("setof", "?s",
         [("in_nation", "?c", "?n"), ("slot", "?c", "c_mktsegment", "?s")],
         "?segs", ["?n"]),
    ])
    want = duck_set(duck, """
        SELECT 'nation:'||c_nationkey,
               list(DISTINCT c_mktsegment ORDER BY c_mktsegment)
        FROM customer GROUP BY 1
    """)
    assert rows_set(df) == want


def test_bagof_witness_inferred(tpch, duck):
    """No explicit witness arg: free vars of Goal minus template (?n) are
    inferred, mirroring the reference (prolog-functors.lisp:479-496)."""
    df = select(tpch, ["?n", "?custs"], [
        ("is-a", "?n", "nation"),
        ("bagof", "?c", [("in_nation", "?c", "?n")], "?custs"),
    ])
    want = duck_set(duck, """
        SELECT 'nation:'||c_nationkey,
               list('customer:'||c_custkey ORDER BY 'customer:'||c_custkey)
        FROM customer GROUP BY 1
    """)
    assert rows_set(df) == want


def test_setof_witness_inferred_with_caret(tpch, duck):
    """('^', [?c], goals...) existentially quantifies ?c so it is excluded
    from the inferred witness: segments group per nation, not per customer
    (prolog-functors.lisp:398-411)."""
    df = select(tpch, ["?n", "?segs"], [
        ("is-a", "?n", "nation"),
        ("setof", "?s",
         [("^", ["?c"],
           ("in_nation", "?c", "?n"),
           ("slot", "?c", "c_mktsegment", "?s"))],
         "?segs"),
    ])
    want = duck_set(duck, """
        SELECT 'nation:'||c_nationkey,
               list(DISTINCT c_mktsegment ORDER BY c_mktsegment)
        FROM customer GROUP BY 1
    """)
    assert rows_set(df) == want


def test_setof_without_caret_groups_per_free_var(tpch, duck):
    """Same query WITHOUT ^: ?c stays free, so it joins the witness and the
    inferred grouping is per (customer, nation) — classic bagof/setof
    behavior — and ?c surfaces as a bound var in the solutions."""
    df = select(tpch, ["?c", "?n", "?segs"], [
        ("is-a", "?n", "nation"),
        ("setof", "?s",
         [("in_nation", "?c", "?n"), ("slot", "?c", "c_mktsegment", "?s")],
         "?segs"),
    ])
    want = duck_set(duck, """
        SELECT 'customer:'||c_custkey, 'nation:'||c_nationkey,
               [c_mktsegment]
        FROM customer
    """)
    assert rows_set(df) == want


def test_forall(tpch, duck):
    # regions where every nation has at least one customer
    df = select(tpch, ["?r"], [
        ("is-a", "?r", "region"),
        ("forall", [("in_region", "?n", "?r")],
         [("in_nation", "?c", "?n")]),
    ])
    want = duck_set(duck, """
        SELECT 'region:'||r_regionkey FROM region
        WHERE NOT EXISTS (
          SELECT 1 FROM nation WHERE n_regionkey=r_regionkey
          AND NOT EXISTS (SELECT 1 FROM customer WHERE c_nationkey=n_nationkey))
    """)
    assert rows_set(df) == want


def test_param_binding(tpch, duck):
    df = select(tpch, ["?c"], [
        ("is-a", "?c", "customer"),
        ("slot", "?c", "c_mktsegment", "?s"),
        ("param", "?seg", "segment"),
        ("=", "?s", "?seg"),
    ], params={"segment": "BUILDING"})
    want = duck_set(duck, """
        SELECT 'customer:'||c_custkey FROM customer
        WHERE c_mktsegment='BUILDING'
    """)
    assert rows_set(df) == want


def test_once_first_solution(tpch):
    # one order per customer (deterministic: min order id per the contract)
    df = select(tpch, ["?c", "?o"], [
        ("is-a", "?c", "customer"),
        ("once", ("placed", "?c", "?o")),
    ])
    pdf = df.toPandas()
    assert pdf["c"].is_unique
    direct = select(tpch, ["?c"], [("placed", "?c", "?o")], distinct=True)
    assert len(pdf) == direct.count()


def test_incoming_outgoing_edges(tpch, duck):
    df = select(tpch, ["?p", "?e"], [
        ("incoming-edges", "?p", "contains", "?e", "?o"),
    ])
    want = duck_set(duck, """
        SELECT 'part:'||l_partkey,
               'contains:'||l_orderkey||'_'||l_linenumber||'_'||rn
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY l_orderkey, l_linenumber
                  ORDER BY l_partkey, l_suppkey, l_quantity, l_extendedprice) AS rn
              FROM lineitem)
    """)
    assert rows_set(df) == want


def test_register_functor_udtf(tpch):
    """def-global-prolog-functor analog (prolog-functors.lisp:9-21): a
    registered Python relation merges into the plan like any goal."""
    import pyspark.sql.functions as F

    from vivace_graph_v3_spark.query import builder as B

    def top_regions(builder, plan, args):
        (var,) = args
        rel = (builder.graph.scan_vertices("region", columns=["id"])
               .select(F.col("id").alias(B.var_col(var))))
        return plan.merge(rel, [B.var_col(var)]).df

    B.register_functor("top-region", top_regions)
    df = B.select(tpch, ["?r"], [("call", "top-region", "?r")])
    assert df.count() == 5


def test_select_foreach_callback(tpch):
    """select :callback streaming (prologc.lisp:1061-1083)."""
    from vivace_graph_v3_spark.query import builder as B

    seen = []
    n = B.Select(tpch, ["?r"], [("is-a", "?r", "region")]).foreach(
        lambda row: seen.append(row["r"]))
    assert n == 5 and len(seen) == 5


def test_geo_near_goal(tpch, duck):
    """geo-near/5 (prolog-functors.lisp:938-945) over synthesized coords."""
    import pyspark.sql.functions as F

    from vivace_graph_v3_spark.query import builder as B

    sel = B.Select(tpch, ["?c", "?lat", "?lon"], [
        ("is-a", "?c", "customer"),
        ("node-slot-value", "?c", "c_custkey", "?k"),
        ("is", "?lat", ("-", ("pmod", ("*", "?k", 37), 180), 90)),
        ("is", "?lon", ("-", ("pmod", ("*", "?k", 73), 360), 180)),
        ("geo-near", "?lat", "?lon", 10.0, 20.0, 6_000_000.0),
    ])
    got = sel.to_df().count()
    want = duck.execute("""
        WITH pts AS (
          SELECT ((c_custkey*37) % 180) - 90 AS lat,
                 ((c_custkey*73) % 360) - 180 AS lon
          FROM customer)
        SELECT count(*) FROM pts
        WHERE 2*6371000*asin(sqrt(
            sin(radians((10.0-lat)/2))^2 +
            cos(radians(lat))*cos(radians(10.0))*sin(radians((20.0-lon)/2))^2
        )) <= 6000000
    """).fetchone()[0]
    assert got == want and got > 0


def test_if_soft_cut(tpch, duck):
    """(if C T E) soft-cut (prologc.lisp:546-569): customers with an order
    above 400k get those orders' prices; the rest get their acctbal."""
    from vivace_graph_v3_spark.query import builder as B

    df = B.select(tpch, ["?c", "?v"], [
        ("is-a", "?c", "customer"),
        ("if",
         [("placed", "?c", "?o"),
          ("node-slot-value", "?o", "o_totalprice", "?p"),
          (">", "?p", 400000)],
         [("=", "?v", "?p")],
         [("node-slot-value", "?c", "c_acctbal", "?v")]),
    ])
    got = {(r["c"], round(r["v"], 2)) for r in df.collect()}
    want = set()
    for ck, price in duck.execute("""
        SELECT 'customer:'||o_custkey, o_totalprice FROM orders
        WHERE o_totalprice > 400000""").fetchall():
        want.add((ck, round(price, 2)))
    rich = {c for c, _ in want}
    for ck, bal in duck.execute(
            "SELECT 'customer:'||c_custkey, c_acctbal FROM customer").fetchall():
        if ck not in rich:
            want.add((ck, round(bal, 2)))
    assert got == want


# -- catch/throw (ISO exceptions, prolog-functors.lisp:255-298) ---------------

def test_catch_recovers_from_a_throw(tpch):
    from pyspark.sql import functions as F
    df = select(tpch, ["?c", "?r"], [
        ("is-a", "?c", "region"),
        ("catch", [("throw", "oops")], "oops", [("is", "?r", 1)]),
    ])
    rows = df.collect()
    assert len(rows) == 5 and all(r["r"] == 1 for r in rows)


def test_catch_passes_through_when_goal_succeeds(tpch):
    df = select(tpch, ["?c", "?x"], [
        ("is-a", "?c", "region"),
        ("catch", [("is", "?x", 5)], "?b", [("is", "?x", 99)]),
    ])
    assert sorted(r["x"] for r in df.collect()) == [5] * 5


def test_catch_binds_the_ball(tpch):
    df = select(tpch, ["?c", "?b"], [
        ("is-a", "?c", "region"),
        ("catch", [("throw", "my-ball")], "?b", []),
    ])
    assert {r["b"] for r in df.collect()} == {"my-ball"}


def test_catch_ball_visible_to_recovery_goals(tpch):
    """ISO catch/3: Ball unifies with Catcher BEFORE Recovery runs, so
    recovery goals can reference the catcher var (compare / branch on it)."""
    df = select(tpch, ["?c", "?r"], [
        ("is-a", "?c", "region"),
        ("catch", [("throw", "E42")], "?b",
         [("==", "?b", "E42"), ("is", "?r", 7)]),
    ])
    rows = df.collect()
    assert len(rows) == 5 and all(r["r"] == 7 for r in rows)
    # a recovery goal comparing against a DIFFERENT ball filters everything
    df2 = select(tpch, ["?c"], [
        ("is-a", "?c", "region"),
        ("catch", [("throw", "E42")], "?b", [("==", "?b", "other")]),
    ])
    assert df2.count() == 0


def test_atom_rejects_compound_values(tpch):
    """atom/1 fails on array-typed (compound) bindings and succeeds on
    scalars (prolog-functors.lisp:90-92)."""
    scalar = select(tpch, ["?n"], [
        ("is-a", "?n", "nation"), ("atom", "?n"),
    ])
    assert scalar.count() == 25
    compound = select(tpch, ["?n", "?custs"], [
        ("is-a", "?n", "nation"),
        ("findall", "?c", [("in_nation", "?c", "?n")], "?custs"),
        ("atom", "?custs"),
    ])
    assert compound.count() == 0


def test_catch_non_matching_ball_propagates(tpch):
    import pytest
    from vivace_graph_v3_spark.query.builder import PrologThrow
    with pytest.raises(PrologThrow):
        select(tpch, ["?c"], [
            ("is-a", "?c", "region"),
            ("catch", [("throw", "inner")], "other", []),
        ])
    # ... but an OUTER var-catcher fields it
    df = select(tpch, ["?c", "?b"], [
        ("is-a", "?c", "region"),
        ("catch", [("catch", [("throw", "inner")], "other", [])], "?b", []),
    ])
    assert {r["b"] for r in df.collect()} == {"inner"}


def test_uncaught_throw_aborts(tpch):
    import pytest
    from vivace_graph_v3_spark.query.builder import PrologThrow
    with pytest.raises(PrologThrow):
        select(tpch, ["?c"], [("is-a", "?c", "region"), ("throw", "boom")])


def test_catch_fields_analysis_errors(tpch):
    # the lisp/is escape-hatch error class: a broken SQL expression inside
    # catch falls to the recovery branch (var catcher = catch anything)
    df = select(tpch, ["?c", "?x"], [
        ("is-a", "?c", "region"),
        ("catch", [("lisp", "?x", "no_such_column + 1")], "?b",
         [("is", "?x", -1)]),
    ], allowed_effects={"eval"})
    assert sorted(r["x"] for r in df.collect()) == [-1] * 5


def test_fail_and_repeat(tpch):
    """fail/0 yields zero solutions; repeat/0 is a documented no-op under
    set semantics (prolog-functors.lisp fail/repeat)."""
    none = select(tpch, ["?c"], [("is-a", "?c", "region"), ("fail",)])
    assert none.count() == 0
    # fail as an `or` branch: union with empty = identity
    both = select(tpch, ["?c"], [
        ("or", [("is-a", "?c", "region")], [("fail",)]),
    ])
    assert both.count() == 5
    rep = select(tpch, ["?c"], [("is-a", "?c", "region"), ("repeat",)])
    assert rep.count() == 5


def test_var_compile_time_boundness(tpch):
    """var/1 (prolog-functors.lisp:141-142): an unbound variable succeeds
    (and stays unbound for later goals to bind); a bound variable or
    constant fails for every row."""
    # ?x unbound at the var/1 goal, bound afterwards: full nation count
    df = select(tpch, ["?x"], [
        ("var", "?x"), ("is-a", "?x", "nation"),
    ])
    assert df.count() == 25
    # bound by the time var/1 runs: empty
    df2 = select(tpch, ["?x"], [
        ("is-a", "?x", "nation"), ("var", "?x"),
    ])
    assert df2.count() == 0
    # constants are never unbound vars
    df3 = select(tpch, ["?n"], [
        ("is-a", "?n", "nation"), ("var", "const"),
    ])
    assert df3.count() == 0


def test_numberp_type_test(tpch):
    """numberp/1 (prolog-functors.lisp:86-88): numeric slots pass, string
    slots fail. Regression: the goal must stay dispatchable."""
    nums = select(tpch, ["?b"], [
        ("is-a", "?c", "customer"),
        ("slot", "?c", "c_acctbal", "?b"), ("numberp", "?b"),
    ])
    assert nums.count() == 150
    strs = select(tpch, ["?n"], [
        ("is-a", "?c", "customer"),
        ("slot", "?c", "c_name", "?n"), ("numberp", "?n"),
    ])
    assert strs.count() == 0


def test_runtime_catch_of_executor_throw(tpch):
    """RUN-TIME catch/3 (prolog-functors.lisp:270-330): a ball thrown from a
    Python UDF while the job is RUNNING (plan-build succeeds; the error
    surfaces mid-execution on an executor) is extracted from the failure,
    unified against the enclosing catch, and the query re-plans into the
    recovery branch."""
    from pyspark.sql import functions as F, types as T

    from vivace_graph_v3_spark.query.builder import (
        PrologThrow, Select, register_functor)

    @F.udf(T.IntegerType())
    def _boom(name):
        if name.startswith("region:"):
            raise PrologThrow("exec-error")
        return 1

    def risky(sel, plan, args):
        (out,) = args
        return plan.df.withColumn(out[1:], _boom(F.col("c")))

    register_functor("risky-score", risky)
    sel = Select(tpch, ["?c", "?r"], [
        ("is-a", "?c", "region"),
        ("catch", [("risky-score", "?x"), ("is", "?r", "?x")],
         "exec-error", [("is", "?r", -1)]),
    ])
    rows = sel.collect()
    assert len(rows) == 5 and all(r["r"] == -1 for r in rows)


def test_runtime_catch_ball_unification(tpch):
    """A variable catcher binds the run-time ball for recovery goals; a
    non-matching constant catcher lets the ball escape as PrologThrow."""
    import pytest
    from pyspark.sql import functions as F, types as T

    from vivace_graph_v3_spark.query.builder import (
        PrologThrow, Select, register_functor)

    @F.udf(T.StringType())
    def _boom2(name):
        raise PrologThrow(("overflow", "E42"))

    def risky2(sel, plan, args):
        (out,) = args
        return plan.df.withColumn(out[1:], _boom2(F.col("c")))

    register_functor("risky-score-2", risky2)
    # ?b must be bound on the success path too (set semantics has no
    # unbound output slots): the goal branch binds it from the functor.
    sel = Select(tpch, ["?c", "?b"], [
        ("is-a", "?c", "region"),
        ("catch", [("risky-score-2", "?b")], "?b", []),
    ])
    rows = sel.collect()
    assert len(rows) == 5
    assert all(tuple(r["b"]) == ("overflow", "E42") for r in rows)

    # ?x must be selected — otherwise Catalyst column-prunes the UDF away
    # and the throw never happens (lazy plans execute only what's needed).
    escaped = Select(tpch, ["?c", "?x"], [
        ("is-a", "?c", "region"),
        ("catch", [("risky-score-2", "?x")], "other-error", [])])
    with pytest.raises(PrologThrow):
        escaped.collect()


# -- REPL I/O functors (prolog-functors.lisp:26-36, 510-518) -------------------

def test_write_nl_stream_per_solution(tpch):
    import io

    from vivace_graph_v3_spark.query.builder import Select

    sel = Select(tpch, ["?r"], [
        ("is-a", "?r", "region"),
        ("write", "region: "), ("write", "?r"), ("nl",),
    ], order_by=["?r"])
    buf = io.StringIO()
    n = sel.run_io(out=buf)
    lines = [ln for ln in buf.getvalue().split("\n") if ln]
    assert n == 5 and len(lines) == 5
    assert all(ln.startswith("region: region:") for ln in lines)


def test_read_binds_and_tests(tpch):
    from vivace_graph_v3_spark.query.builder import Select

    # unbound: read binds ?x; bound: read acts as an equality test
    sel = Select(tpch, ["?r", "?x"], [
        ("is-a", "?r", "region"), ("read", "?x"),
    ], io_input=[42])
    rows = sel.collect()
    assert len(rows) == 5 and all(r["x"] == 42 for r in rows)

    keep = Select(tpch, ["?r"], [
        ("is-a", "?r", "region"), ("read", "?r"),
    ], io_input=["region:1"]).collect()
    assert [r["r"] for r in keep] == ["region:1"]


def test_show_prolog_vars_and_io_effect_gate(tpch):
    import io

    import pytest

    from vivace_graph_v3_spark.query.builder import EffectNotAllowed, Select

    buf = io.StringIO()
    n = Select(tpch, ["?r"], [("is-a", "?r", "region")],
               order_by=["?r"]).show_prolog_vars(out=buf)
    out = buf.getvalue()
    assert n == 5 and out.count("?r = region:") == 5

    # no selected vars -> 'Yes' per solution (top-level prove semantics)
    buf2 = io.StringIO()
    Select(tpch, [], [("is-a", "?r", "region")],
           count_only=False).show_prolog_vars(out=buf2)
    assert "Yes" in buf2.getvalue()

    # io is effect-gated exactly like eval/write (REST passes frozenset())
    with pytest.raises(EffectNotAllowed):
        Select(tpch, ["?r"], [("is-a", "?r", "region"), ("nl",)],
               allowed_effects=frozenset()).to_df()
