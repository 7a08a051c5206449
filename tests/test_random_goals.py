"""Randomized differential testing of the goal-list query builder: seeded
random conjunctive queries over the F6 TPC-H graph, compiled through
``select`` AND hand-translated to DuckDB SQL over the raw tables — result
sets must match exactly. Broadens the per-entry oracle checks into the
parameter space (random thresholds, comparison operators, projections)."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vivace_graph_v3_spark.entry_queries import load_tpch_graph
from vivace_graph_v3_spark.query import select

SEED, N_CASES = 20260814, 12


@pytest.fixture(scope="module")
def duck_f6():
    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "nation", "region",
              "supplier", "part"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_random_conjunctive_goals_match_sql(spark, duck_f6):
    g = load_tpch_graph(spark, SF_DIR)
    rng = random.Random(SEED)
    ops = {"<": "<", ">": ">", "<=": "<=", ">=": ">="}
    for case in range(N_CASES):
        thr = rng.choice([5, 10, 17, 25, 33, 41, 49])
        op = rng.choice(list(ops))
        proj = rng.choice([["?c", "?o"], ["?o", "?p"], ["?c", "?p", "?w"]])
        goals = [
            ("is-a", "?c", "customer"),
            ("placed", "?c", "?o"),
            ("contains", "?o", "?p", "?w"),
            (op, "?w", float(thr)),
        ]
        got = {tuple(r) for r in
               select(g, proj, goals).dropDuplicates().collect()}
        cols = {"?c": "'customer:' || o_custkey",
                "?o": "'orders:' || l_orderkey",
                "?p": "'part:' || l_partkey",
                "?w": "l_quantity"}
        sel = ", ".join(cols[v] for v in proj)
        sql = f"""
            SELECT DISTINCT {sel}
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            WHERE l_quantity {ops[op]} {thr}
        """
        want = {tuple(r) for r in duck_f6.execute(sql).fetchall()}
        assert got == want, f"case {case}: {op} {thr} proj={proj}"


def test_random_negation_and_unique(spark, duck_f6):
    g = load_tpch_graph(spark, SF_DIR)
    rng = random.Random(SEED + 1)
    for case in range(6):
        thr = rng.choice([10, 20, 30, 40])
        goals = [
            ("is-a", "?c", "customer"),
            ("placed", "?c", "?o"),
            ("not", ("contains", "?o", "?p", "?w"),
             (">", "?w", float(thr))),
        ]
        got = {r[0] for r in select(g, ["?o"], goals)
               .dropDuplicates().collect()}
        sql = f"""
            SELECT DISTINCT 'orders:' || o_orderkey
            FROM orders
            WHERE NOT EXISTS (SELECT 1 FROM lineitem
                              WHERE l_orderkey = o_orderkey
                                AND l_quantity > {thr})
        """
        want = {r[0] for r in duck_f6.execute(sql).fetchall()}
        assert got == want, f"case {case}: thr={thr}"


def test_random_once_with_not_in_list(spark, duck_f6):
    """once/1 + not-in-list under random exclusion lists: the first
    placed order per surviving customer must equal the SQL group-min
    (the documented ascending-binding determinism contract)."""
    g = load_tpch_graph(spark, SF_DIR)
    rng = random.Random(SEED + 2)
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
            "MACHINERY"]
    for case in range(6):
        excl = rng.sample(segs, rng.randrange(1, 4))
        goals = [
            ("is-a", "?c", "customer"),
            ("slot", "?c", "c_mktsegment", "?s"),
            ("not-in-list", "?s", excl),
            ("once", ("placed", "?c", "?o")),
        ]
        got = {(r["c"], r["o"]) for r in select(g, ["?c", "?o"], goals)
               .collect()}
        in_list = ", ".join(f"'{s}'" for s in excl)
        sql = f"""
            SELECT 'customer:' || o_custkey,
                   min('orders:' || o_orderkey)
            FROM orders JOIN customer ON c_custkey = o_custkey
            WHERE c_mktsegment NOT IN ({in_list})
            GROUP BY 1
        """
        want = {tuple(r) for r in duck_f6.execute(sql).fetchall()}
        assert got == want, f"case {case}: excl={excl}"
