"""JSON pattern DSL + def-query tests over the TPC-H graph projection,
mirroring the reference's rest-tests.lisp pattern/parameterized coverage
(rest.lisp:448-589, 367-433) against the DuckDB oracle."""

import pytest

from vivace_graph_v3_spark.query.pattern import (
    ParamError, clear_queries, compile_pattern_query, def_query, run_query,
)


def test_pattern_vertex_slot_filter(tpch, duck):
    spec = {
        "match": [{"vertex": "?c", "type": "customer"}],
        "where": [{"slot": ["?c", "c_acctbal"], "op": ">", "value": 9000}],
        "select": [{"slot": ["?c", "c_name"], "as": "?name"}],
        "limit": 100000,
    }
    got = {r["name"] for r in compile_pattern_query(tpch, spec).collect()}
    want = {r[0] for r in duck.execute(
        "SELECT c_name FROM customer WHERE c_acctbal > 9000").fetchall()}
    assert got == want and got


def test_pattern_edge_join(tpch, duck):
    # customers in nations of region AMERICA, via two edge patterns
    spec = {
        "match": [
            {"edge": "in_nation", "from": "?c", "to": "?n"},
            {"edge": "in_region", "from": "?n", "to": "?r"},
        ],
        "where": [{"var": "?r", "op": "=", "value": "region:1"}],
        "select": ["?c"],
        "limit": 1000000,
    }
    got = compile_pattern_query(tpch, spec).count()
    want = duck.execute(
        "SELECT count(*) FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "WHERE n.n_regionkey = 1").fetchone()[0]
    assert got == want


def test_pattern_in_and_regex(tpch, duck):
    spec = {
        "match": [{"vertex": "?c", "type": "customer"}],
        "where": [
            {"slot": ["?c", "c_mktsegment"], "var": "?seg"},
            {"var": "?seg", "op": "in", "value": ["BUILDING", "MACHINERY"]},
            {"slot": ["?c", "c_name"], "var": "?nm"},
            {"var": "?nm", "op": "regex", "value": "1$"},
        ],
        "select": ["?nm", "?seg"],
        "limit": 100000,
    }
    got = {(r["nm"], r["seg"]) for r in compile_pattern_query(tpch, spec).collect()}
    want = set(duck.execute(
        "SELECT c_name, c_mktsegment FROM customer WHERE c_mktsegment IN "
        "('BUILDING','MACHINERY') AND regexp_matches(c_name, '1$')").fetchall())
    assert got == want and got


def test_pattern_limit_default_applied(tpch):
    spec = {"match": [{"vertex": "?o", "type": "orders"}], "select": ["?o"]}
    assert compile_pattern_query(tpch, spec).count() <= 1000


def test_def_query_param_coercion_and_run(tpch, duck):
    clear_queries()
    def_query(
        "big_balance",
        vars=["?name", "?bal"],
        goals=[("is-a", "?c", "customer"),
               ("node-slot-value", "?c", "c_acctbal", "?bal"),
               ("node-slot-value", "?c", "c_name", "?name"),
               ("param", "?min", "min_bal"),
               (">", "?bal", "?min")],
        params={"min_bal": "float"},
        limit=None,
    )
    got = {r["name"] for r in run_query(tpch, "big_balance",
                                        {"min_bal": "9500"}).collect()}
    want = {r[0] for r in duck.execute(
        "SELECT c_name FROM customer WHERE c_acctbal > 9500").fetchall()}
    assert got == want and got


def test_def_query_param_errors(tpch):
    clear_queries()
    def_query("q", vars=["?x"], goals=[("param", "?x", "n")],
              params={"n": "int"})
    with pytest.raises(ParamError):
        run_query(tpch, "q", {"n": "not-an-int"})
    with pytest.raises(ParamError):
        run_query(tpch, "q", {})
    with pytest.raises(KeyError):
        run_query(tpch, "nope", {})
