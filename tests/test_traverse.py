"""BFS traversal vs a DuckDB oracle — mirrors tests/traverse-tests.lisp."""

from tests.conftest import rows_set, duck_set
from vivace_graph_v3_spark.operators.traverse import traverse


def test_bfs_out_depth2(tpch, duck):
    # region:0 <-in_region- nations <-in_nation- customers (direction 'in')
    df = traverse(tpch, ["region:0"], direction="in", max_depth=2)
    want = duck_set(duck, """
        SELECT 'region:0', 0
        UNION ALL
        SELECT 'nation:'||n_nationkey, 1 FROM nation WHERE n_regionkey=0
        UNION ALL
        SELECT 'customer:'||c_custkey, 2 FROM customer JOIN nation
          ON c_nationkey=n_nationkey WHERE n_regionkey=0
        UNION ALL
        SELECT 'supplier:'||s_suppkey, 2 FROM supplier JOIN nation
          ON s_nationkey=n_nationkey WHERE n_regionkey=0
    """)
    assert rows_set(df) == want


def test_bfs_min_depth_uniqueness(tpch, duck):
    # customer -> orders (placed) and customer -> nation (in_nation):
    # direction 'out' from one customer; depth-3 stays unique per vertex
    df = traverse(tpch, ["customer:1"], direction="out", max_depth=3)
    rows = df.collect()
    ids = [r["id"] for r in rows]
    assert len(ids) == len(set(ids))  # global uniqueness
    want = duck_set(duck, """
        SELECT 'customer:1', 0
        UNION ALL
        SELECT 'orders:'||o_orderkey, 1 FROM orders WHERE o_custkey=1
        UNION ALL
        SELECT 'nation:'||c_nationkey, 1 FROM customer WHERE c_custkey=1
        UNION ALL
        SELECT 'region:'||n_regionkey, 2 FROM customer JOIN nation
          ON c_nationkey=n_nationkey WHERE c_custkey=1
        UNION ALL
        SELECT DISTINCT x.id, 2 FROM (
          SELECT 'part:'||l_partkey AS id FROM orders JOIN lineitem
            ON l_orderkey=o_orderkey WHERE o_custkey=1
          UNION
          SELECT 'supplier:'||l_suppkey FROM orders JOIN lineitem
            ON l_orderkey=o_orderkey WHERE o_custkey=1) x
        UNION ALL
        SELECT DISTINCT 'nation:'||s_nationkey, 3
        FROM supplier JOIN (
          SELECT DISTINCT l_suppkey FROM orders JOIN lineitem
            ON l_orderkey=o_orderkey WHERE o_custkey=1) s
          ON s_suppkey=l_suppkey
        WHERE 'nation:'||s_nationkey <> (
          SELECT 'nation:'||c_nationkey FROM customer WHERE c_custkey=1)
    """)
    assert rows_set(df) == want


def test_bfs_edge_type_filter(tpch, duck):
    df = traverse(tpch, ["customer:1"], direction="out",
                  edge_type="placed", max_depth=2)
    want = duck_set(duck, """
        SELECT 'customer:1', 0
        UNION ALL
        SELECT 'orders:'||o_orderkey, 1 FROM orders WHERE o_custkey=1
    """)
    assert rows_set(df) == want


def test_bfs_paths(tpch):
    df = traverse(tpch, ["region:0"], direction="in", max_depth=1,
                  include_paths=True)
    for r in df.collect():
        if r["depth"] == 0:
            assert r["path"] == ["region:0"]
        else:
            assert r["path"][0] == "region:0" and r["path"][-1] == r["id"]
            assert len(r["path"]) == 2


def test_typed_arm_pruning_differential(tpch):
    """Typed-arm pruning (r10): traverse over the F6 graph (endpoint types
    declared -> arms pruned per round) must produce EXACTLY the rows of the
    same traversal with the metadata stripped (every arm scanned, the
    pre-pruning path)."""
    stripped = dict(tpch._edge_endpoints)
    try:
        tpch._edge_endpoints = {}
        want = {tuple(r) for r in
                traverse(tpch, ["region:0"], direction="in",
                         max_depth=2).collect()}
        want_both = {tuple(r) for r in
                     traverse(tpch, ["nation:3"], direction="both",
                              max_depth=2).collect()}
    finally:
        tpch._edge_endpoints = stripped
    got = {tuple(r) for r in
           traverse(tpch, ["region:0"], direction="in",
                    max_depth=2).collect()}
    got_both = {tuple(r) for r in
                traverse(tpch, ["nation:3"], direction="both",
                         max_depth=2).collect()}
    assert got == want
    assert got_both == want_both
