"""Driver-contract hygiene: the __spark_entry__ surface stays well-formed.

The heavy per-query oracle comparison lives in tools/check_contract.py (run
manually / by the driver); this guards the cheap invariants that break the
whole round if violated: registry shape, flagship entry, schema stability.
"""

import __spark_entry__ as entry_mod

from tests.conftest import SF_DIR


def test_registry_shape():
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    assert len(qs) >= 80
    assert set(sqls) <= set(qs), "oracle for unknown query"
    assert all(callable(f) for f in qs.values())
    # every registered query is oracle-checked — no rows-only entries left
    rows_only = set(qs) - set(sqls)
    assert not rows_only, f"unexpected rows-only queries: {rows_only}"


def test_flagship_entry(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 5  # one per region
    assert set(df.columns) == {"r_name", "total_quantity", "n_lineitems"}
    assert all(r["n_lineitems"] > 0 for r in rows)


def test_every_query_compiles(spark):
    """Plan-build every contract query at the tests' SF: catches missing
    columns/tables/aliases without executing (schema analysis only —
    seconds, not minutes)."""
    qs = entry_mod.queries()
    for name, fn in sorted(qs.items()):
        df = fn(spark, SF_DIR)
        assert df.schema is not None and len(df.columns) > 0, name


def test_no_previously_green_entry_dropped():
    """Registry rotation is append-or-reorder-only: every query that earned a
    green driver row in a past round's CORRECTNESS file must still be
    registered, so reordering for driver-sample coverage can never silently
    lose a verified operator."""
    import glob
    import json
    import os

    qs = set(entry_mod.queries())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        green = {name for name, r in rows.items()
                 if isinstance(r, dict) and r.get("hash_match")}
        missing = green - qs
        assert not missing, f"{os.path.basename(path)} green entries dropped: {missing}"


def test_every_oracle_sql_parses_in_duckdb():
    """EXPLAIN-prepare every registry oracle against DuckDB views of the
    smallest SF — catches reserved-word/syntax regressions (e.g. `full`
    as a CTE name) in seconds without running the queries."""
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    bad = []
    for name, sql in entry_mod.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as ex:  # noqa: BLE001 - collect every failure
            bad.append(f"{name}: {type(ex).__name__}: {str(ex)[:120]}")
    assert not bad, "\n".join(bad)


def test_ann_recall_fixture_constants_still_measured(spark):
    """The ANN recall oracles embed MEASURED fixture constants (ANN
    candidate generation is not SQL-expressible). Pin them: if the
    testdata fixture regenerates, this fails loudly instead of the
    driver hash silently drifting. sf0.01 is the driver's contract SF."""
    qs = entry_mod.queries()
    sf = "/root/testdata/sf0.01"
    got = {name: qs[name](spark, sf).first().asDict()
           for name in ("ann_ivf_recall", "ann_lsh_recall")}
    assert got["ann_ivf_recall"]["n_hits"] == 46, got
    assert got["ann_lsh_recall"]["n_hits"] == 48, got
