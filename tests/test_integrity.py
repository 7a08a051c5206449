"""Backup/restore + check-data-integrity tests (backup.lisp:3-80) and the
effect sandbox (prologc.lisp:902-943): read-only queries must reject
eval/write functors; permissive queries run them."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from vivace_graph_v3_spark.graph import GraphStore
from vivace_graph_v3_spark.mvcc import VersionedGraph
from vivace_graph_v3_spark.operators.integrity import (
    backup, check_data_integrity, integrity_report, restore,
)
from vivace_graph_v3_spark.query import builder as B
from vivace_graph_v3_spark.query.builder import EffectNotAllowed
from vivace_graph_v3_spark.schema import SchemaRegistry


def _graph(spark, *, break_it=False):
    reg = SchemaRegistry()
    reg.def_vertex("person", {"name": T.StringType()})
    reg.def_edge("knows")
    g = GraphStore(spark, reg, name="t")
    g.add_vertices("person", spark.createDataFrame(
        [("p1", "person", False, 0, 0, "ann"),
         ("p2", "person", True, 1, 2, "bob")],
        "id string, type string, deleted boolean, revision long, "
        "commit_epoch long, name string"))
    edges = [("e1", "p1", "p2", False),          # half-dead: p2 deleted
             ("e2", "p1", "p1", False)]
    if break_it:
        edges.append(("e3", "p1", "ghost", False))   # dangling dst
    g.add_edges("knows", spark.createDataFrame(
        [(i, "knows", d, 0, 0, s, t_, 1.0) for i, s, t_, d in edges],
        "id string, type string, deleted boolean, revision long, "
        "commit_epoch long, src string, dst string, weight double"))
    return g


def test_integrity_clean_vs_broken(spark):
    clean = _graph(spark)
    checks = check_data_integrity(clean)
    assert checks["dangling_edges"].isEmpty()
    assert [r["id"] for r in checks["half_dead_edges"].collect()] == ["e1"]

    broken = _graph(spark, break_it=True)
    rep = {r["check"]: r["violations"]
           for r in integrity_report(broken).collect()}
    assert rep["dangling_edges"] == 1
    assert rep["half_dead_edges"] == 1
    assert rep["duplicate_ids"] == 0
    assert rep["negative_revisions"] == 0


def test_backup_restore_roundtrip(spark, tmp_path):
    g = _graph(spark)
    backup(g, str(tmp_path / "bk"))
    g2 = restore(GraphStore, spark, g.registry, str(tmp_path / "bk"))
    assert g2.scan_vertices("person", include_deleted=True).count() == 2
    assert g2.scan_edges("knows").count() == 2
    assert (g2.scan_vertices("person").first()["name"] == "ann")


def test_effect_sandbox(spark, tmp_path):
    g = _graph(spark)
    goals = [("is-a", "?p", "person"),
             ("lisp", "?x", "upper('a')")]
    # permissive default allows eval
    df = B.select(g, ["?p", "?x"], goals)
    assert df.first()["x"] == "A"
    # read-only query rejects it
    with pytest.raises(EffectNotAllowed):
        B.select(g, ["?p", "?x"], goals, allowed_effects=frozenset())


def test_retract_goal_requires_write_and_mutates(spark, tmp_path):
    reg = SchemaRegistry()
    reg.def_vertex("person", {"name": T.StringType()})
    vg = VersionedGraph(spark, reg, str(tmp_path / "g"))
    vg.commit(vg.begin().create("person", spark.createDataFrame(
        [("p1", "ann"), ("p2", "bob")], "id string, name string")))
    store = vg.store()
    store.versioned = vg
    goals = [("is-a", "?p", "person"),
             ("node-slot-value", "?p", "name", "?n"),
             ("==", "?n", "bob"),
             ("retract", "?p", "person")]
    with pytest.raises(EffectNotAllowed):
        B.select(store, ["?p"], goals, allowed_effects={"eval"})
    B.select(store, ["?p"], goals)  # write allowed by default
    assert [r["name"] for r in vg.read("person").collect()] == ["ann"]


def test_fk_integrity_audit_counts(spark):
    from vivace_graph_v3_spark.operators.integrity import fk_integrity_audit

    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    child = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2), (4, 99), (5, None)], "id long, fk long")
    r = fk_integrity_audit([("child->parent", child, "fk", parent, "pk")]) \
        .first()
    assert (r.fk, r.n_child, r.n_null_keys, r.n_orphans) == \
        ("child->parent", 5, 1, 1)
