import os

import pytest

from vivace_graph_v3_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("vgv3-tests")
    yield spark


@pytest.fixture(scope="session")
def tpch(spark):
    from vivace_graph_v3_spark.graph import load_tpch_graph

    return load_tpch_graph(spark, SF_DIR)


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def rows_set(df, round_floats=None):
    """Order-insensitive multiset of rows for result comparison."""
    out = []
    for r in df.collect():
        vals = []
        for v in r:
            if round_floats is not None and isinstance(v, float):
                v = round(v, round_floats)
            if isinstance(v, list):
                v = tuple(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out)


def duck_set(con, sql, round_floats=None):
    out = []
    for row in con.execute(sql).fetchall():
        vals = []
        for v in row:
            if round_floats is not None and isinstance(v, float):
                v = round(v, round_floats)
            if isinstance(v, list):
                v = tuple(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out)
