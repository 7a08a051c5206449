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


def test_aside_recovery_after_simulated_crash(spark, tmp_path):
    """ADVICE r6: a crash between the two renames of a bucket swap
    leaves the live bucket dir absent with the rows intact only at the
    ``.old-b<b>`` aside. The next apply_batch must restore the aside
    before computing, so no rows are lost."""
    import shutil

    vg = _store(spark, tmp_path)
    view = str(tmp_path / "view")
    m = JoinViewMaintainer(vg, view, edge_type="pays",
                           vertex_type="acct", slot="bal", n_buckets=8)
    ck = str(tmp_path / "ck")
    m.catch_up(checkpoint=ck)
    want = _expected(vg)
    assert _view_set(m) == want

    # simulate the crash window: one live bucket renamed aside, live gone
    buckets = [d for d in os.listdir(view) if d.startswith("bucket=")]
    b = buckets[0].split("=", 1)[1]
    os.rename(f"{view}/bucket={b}", f"{view}.old-b{b}")
    assert _view_set(m) != want  # the damage is real

    # an empty batch is enough: recovery runs before the touched check
    empty = vg.spark.createDataFrame(
        [], "kind string, type string, id string, src string")
    m.apply_batch(empty, batch_id=999)
    assert not os.path.exists(f"{view}.old-b{b}")
    assert _view_set(m) == want

    # whole-table aside (full_refresh crash window): live dir absent
    os.rename(view, f"{view}.old")
    m._recover_asides()
    assert os.path.isdir(view) and _view_set(m) == want

    # an aside whose live dir EXISTS (crash before the second rename
    # completed a later batch) is left alone — live wins
    shutil.copytree(f"{view}/bucket={b}", f"{view}.old-b{b}")
    m._recover_asides()
    assert os.path.isdir(f"{view}.old-b{b}")  # not clobbered onto live
    assert _view_set(m) == want
    shutil.rmtree(f"{view}.old-b{b}")


def test_cc_store_aside_recovery(spark, tmp_path):
    """ADVICE r6, cc label store: if the live path is missing but the
    .old aside exists, the next batch renames the aside back instead of
    restarting from an empty store."""
    import os as _os

    from vivace_graph_v3_spark.streaming.ingest import cc_apply_batch

    labels = str(tmp_path / "cc_labels")
    b1 = spark.createDataFrame([("a", "b"), ("c", "d")], "src string, dst string")
    s1 = cc_apply_batch(b1, labels)
    assert s1["n_vertices"] == 4
    # simulate the crash window between the two renames
    _os.rename(labels, labels + ".old")
    b2 = spark.createDataFrame([("b", "c")], "src string, dst string")
    s2 = cc_apply_batch(b2, labels)
    # state recovered: no vertex is "new", all 4 collapse to one comp
    assert s2["n_new_vertices"] == 0 and s2["n_vertices"] == 4
    comps = {r["comp"] for r in spark.read.parquet(labels).collect()}
    assert len(comps) == 1
    assert not _os.path.exists(labels + ".old")


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
