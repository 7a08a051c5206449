"""Local mimic of the driver's correctness gate: run every __spark_entry__
query at a given SF against its DuckDB oracle; compare row count, sorted
column names, and an order-insensitive value hash (floats rounded)."""

from __future__ import annotations

import hashlib
import math
import sys
import time

sys.path.insert(0, "/root/repo")


def canon(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = f"{v:.6f}"
            elif isinstance(v, (list, tuple)):
                v = "[" + ",".join(
                    f"{x:.6f}" if isinstance(x, float) else str(x) for x in v) + "]"
            vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return hashlib.sha256("\n".join(out).encode()).hexdigest()[:16], len(out)


def main(sf_dir: str, only: list[str]):
    import duckdb

    import __spark_entry__ as e
    from vivace_graph_v3_spark.session import get_spark

    spark = get_spark("contract-check")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    names = only or sorted(qs)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            cols = sorted(sdf.columns)
            srows = [r.asDict() for r in sdf.collect()]
            shash, sn = canon(srows, cols)
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {type(ex).__name__}: {str(ex)[:160]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: rows-only ({sn} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetch_arrow_table().to_pylist()
            dcols = sorted(ddf[0].keys()) if ddf else cols
            dhash, dn = canon(ddf, dcols)
        except Exception as ex:
            print(f"FAIL  {name}: oracle error: {type(ex).__name__}: {str(ex)[:160]}")
            failures.append(name)
            continue
        ok_cols = cols == dcols
        ok = ok_cols and sn == dn and shash == dhash
        status = "OK   " if ok else "FAIL "
        detail = "" if ok else (
            f"  cols={cols} vs {dcols}" if not ok_cols
            else f"  rows {sn} vs {dn}, hash {shash} vs {dhash}")
        print(f"{status} {name}: {sn} rows ({time.time()-t0:.1f}s){detail}")
        if not ok:
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} OK; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(main(sf, sys.argv[2:]))
