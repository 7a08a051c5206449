"""Tests for JoinViewMaintainer: incremental equi-join view maintenance
with bucket-scoped rewrites (streaming/join_view.py)."""

import os

from pyspark.sql import functions as F, types as T

from vivace_graph_v3_spark.mvcc import VersionedGraph
from vivace_graph_v3_spark.schema import SchemaRegistry
from vivace_graph_v3_spark.streaming.join_view import JoinViewMaintainer


def _store(spark, tmp_path):
    reg = SchemaRegistry()
    reg.def_vertex("acct", {"bal": T.DoubleType()})
    reg.def_edge("pays", ())
    vg = VersionedGraph(spark, reg, str(tmp_path / "g"))
    verts = spark.createDataFrame(
        [(f"a{i}", float(i * 10)) for i in range(8)], "id string, bal double")
    edges = spark.createDataFrame(
        [(f"e{i}", f"a{i}", f"a{(i + 1) % 8}", 1.0) for i in range(8)],
        "id string, src string, dst string, weight double")
    vg.commit(vg.begin().create("acct", verts))
    vg.commit(vg.begin().create("pays", edges))
    return vg


def _expected(vg):
    e = vg.read("pays").select("id", "src", "dst", "weight")
    v = vg.read("acct").select(F.col("id").alias("src"), "bal")
    return {(r["id"], r["src"], r["dst"], r["bal"])
            for r in e.join(v, "src").collect()}


def _view_set(m):
    return {(r["id"], r["src"], r["dst"], r["bal"])
            for r in m.table().collect()}


def test_catchup_builds_and_tracks_commits(spark, tmp_path):
    vg = _store(spark, tmp_path)
    m = JoinViewMaintainer(vg, str(tmp_path / "view"),
                           edge_type="pays", vertex_type="acct",
                           slot="bal", n_buckets=8)
    ck = str(tmp_path / "ck")
    m.catch_up(checkpoint=ck)
    assert _view_set(m) == _expected(vg)

    # slot update must rewrite the joined value on that src's edges
    cur = (vg.read("acct").filter(F.col("id") == "a3")
           .select("id", (F.col("bal") + 5).alias("bal"), "revision"))
    vg.commit(vg.begin().save("acct", cur))
    m.catch_up(checkpoint=ck)
    got = _view_set(m)
    assert got == _expected(vg)
    assert any(b == 35.0 for (_, s, _, b) in got if s == "a3")

    # vertex delete retires its outgoing edge rows (active-edge rule)
    vg.commit(vg.begin().mark_deleted(
        "acct", spark.createDataFrame([("a5",)], ["id"])))
    m.catch_up(checkpoint=ck)
    got = _view_set(m)
    assert got == _expected(vg)
    assert not any(s == "a5" for (_, s, _, _) in got)

    # edge delete retires exactly that row
    eid = vg.read("pays").filter(F.col("src") == "a1") \
        .select("id").first()["id"]
    vg.commit(vg.begin().mark_deleted("pays", [eid]))
    m.catch_up(checkpoint=ck)
    assert _view_set(m) == _expected(vg)


def test_untouched_buckets_not_rewritten(spark, tmp_path):
    vg = _store(spark, tmp_path)
    m = JoinViewMaintainer(vg, str(tmp_path / "view"),
                           edge_type="pays", vertex_type="acct",
                           slot="bal", n_buckets=8)
    ck = str(tmp_path / "ck")
    m.catch_up(checkpoint=ck)

    def bucket_mtimes():
        base = str(tmp_path / "view")
        out = {}
        for d in os.listdir(base):
            if d.startswith("bucket="):
                p = os.path.join(base, d)
                out[d] = max(os.path.getmtime(os.path.join(p, f))
                             for f in os.listdir(p))
        return out

    before = bucket_mtimes()
    # touch ONE key
    cur = (vg.read("acct").filter(F.col("id") == "a0")
           .select("id", (F.col("bal") + 1).alias("bal"), "revision"))
    vg.commit(vg.begin().save("acct", cur))
    m.catch_up(checkpoint=ck)
    after = bucket_mtimes()

    from vivace_graph_v3_spark.streaming.join_view import JoinViewMaintainer as J
    touched_bucket = spark.createDataFrame([("a0",)], ["id"]).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(8)).cast("int").alias("b")
    ).first()["b"]
    changed = {d for d in before
               if after.get(d, 0) != before[d] or d not in after}
    assert f"bucket={touched_bucket}" in changed
    # every OTHER bucket's files untouched
    assert changed <= {f"bucket={touched_bucket}"}
    assert _view_set(m) == _expected(vg)
