"""10M-node snapshot/replay probe — the one absolute number the reference
publishes (README.md:39-53: a 10,000,000-node snapshot REPLAY took ~2 hours
after the 2016 hash/UUID rework, ~2.5 days before it).

This probe runs the same operation class through the Spark engine: build a
10M-vertex graph through the MVCC write path, `snapshot` it (dump live nodes
as replayable txn rows), `replay` into a fresh store, and time a first read
from the replayed graph (forcing the merge-on-read resolution). Hardware
differs, so the comparison is an order-of-magnitude check, not a benchmark;
the structural point is that snapshot/replay here are O(rows) parquet jobs
that parallelize across all cores/executors, not a single-threaded
row-by-row reload.

Run: python tools/snapshot10m_probe.py [n_rows]   (default 10_000_000)
Prints one JSON line with per-phase seconds.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n: int) -> dict:
    from pyspark.sql import functions as F, types as T

    from vivace_graph_v3_spark.mvcc import VersionedGraph
    from vivace_graph_v3_spark.schema import SchemaRegistry
    from vivace_graph_v3_spark.session import get_spark

    spark = get_spark("snapshot10m")
    base = tempfile.mkdtemp(prefix="vgv3_snap10m_")
    reg = SchemaRegistry()
    reg.def_vertex("node", {"name": T.StringType(), "score": T.DoubleType()})

    timings: dict[str, float] = {"n_rows": n}
    try:
        rows = (spark.range(n)
                .select(F.concat(F.lit("node:"), F.col("id")).alias("id"),
                        F.concat(F.lit("name-"), F.col("id")).alias("name"),
                        (F.col("id") % 997 / 997.0).alias("score")))
        g = VersionedGraph(spark, reg, os.path.join(base, "src"))
        t0 = time.time()
        g.commit(g.begin().create("node", rows))
        timings["insert_s"] = round(time.time() - t0, 2)

        snap = os.path.join(base, "snap")
        t0 = time.time()
        g.snapshot(snap)
        timings["snapshot_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        g2 = VersionedGraph.replay(spark, reg, snap,
                                   os.path.join(base, "replayed"))
        timings["replay_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        cnt = g2.read("node").count()
        timings["first_read_s"] = round(time.time() - t0, 2)
        timings["rows_read"] = cnt
        assert cnt == n, (cnt, n)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return timings


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    print(json.dumps(main(n)))
