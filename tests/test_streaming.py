"""Replication + incremental view maintenance tests, mirroring the
reference's replication suite (tests/replication/) and view incremental
semantics (views.lisp:331-427): full replication, subset filter with
update->delete demotion, checkpoint resume, and view maintenance across
insert/update/delete including vertex-delete retiring edge view rows."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from vivace_graph_v3_spark.mvcc import VersionedGraph
from vivace_graph_v3_spark.schema import SchemaRegistry
from vivace_graph_v3_spark.streaming import ViewMaintainer, replicate_and_wait
from vivace_graph_v3_spark.views import View


def _registry():
    reg = SchemaRegistry()
    reg.def_vertex("person", {"name": T.StringType(), "age": T.IntegerType()})
    reg.def_edge("knows")
    return reg


def _people(spark, rows):
    return spark.createDataFrame(rows, "id string, name string, age int")


@pytest.fixture()
def master(spark, tmp_path):
    vg = VersionedGraph(spark, _registry(), str(tmp_path / "master"))
    vg.commit(vg.begin().create("person", _people(spark, [
        ("p1", "ann", 30), ("p2", "bob", 40), ("p3", "cyd", 17)])))
    return vg


def test_full_replication_and_resume(master, spark, tmp_path):
    replica = VersionedGraph(spark, master.registry, str(tmp_path / "replica"))
    cp = str(tmp_path / "cp")
    replicate_and_wait(spark, master.log_path, replica, checkpoint=cp)
    assert replica.read("person").count() == 3
    # new commits on the master; resume from checkpoint picks up only deltas
    master.commit(master.begin().mark_deleted("person", ["p2"]))
    replicate_and_wait(spark, master.log_path, replica, checkpoint=cp)
    assert {r["name"] for r in replica.read("person").collect()} == {"ann", "cyd"}


def test_subset_replication_demotes_updates(master, spark, tmp_path):
    # slave replicates only adults (the spatial-area-filter analog,
    # transactions.lisp:884-956)
    replica = VersionedGraph(spark, master.registry, str(tmp_path / "replica"))
    cp = str(tmp_path / "cp")
    preds = {"person": lambda p: p["age"] >= 18}
    replicate_and_wait(spark, master.log_path, replica, checkpoint=cp,
                       predicates=preds)
    assert {r["name"] for r in replica.read("person").collect()} == {"ann", "bob"}

    # ann's update moves her out of the subset -> becomes a delete on the slave
    row = master.read("person").filter(F.col("id") == "p1").first()
    upd = spark.createDataFrame([("p1", "ann", 16, row["revision"])],
                                "id string, name string, age int, revision long")
    master.commit(master.begin().save("person", upd))
    # cyd's update moves her in
    row = master.read("person").filter(F.col("id") == "p3").first()
    upd = spark.createDataFrame([("p3", "cyd", 18, row["revision"])],
                                "id string, name string, age int, revision long")
    master.commit(master.begin().save("person", upd))
    replicate_and_wait(spark, master.log_path, replica, checkpoint=cp,
                       predicates=preds)
    assert {r["name"] for r in replica.read("person").collect()} == {"bob", "cyd"}


def _age_view():
    return View(class_name="person", name="by-age", kind="vertex",
                map_fn=lambda df: df.select(
                    "id", F.col("age").cast("string").alias("key"),
                    F.lit(1.0).alias("value")),
                reduce_agg=F.sum("value"))


def test_view_maintenance_insert_update_delete(master, spark, tmp_path):
    vm = ViewMaintainer(master, _age_view(), str(tmp_path / "vt"))
    cp = str(tmp_path / "vcp")
    vm.catch_up(checkpoint=cp)
    assert {(r["key"], r["value"]) for r in vm.reduced().collect()} == {
        ("30", 1.0), ("40", 1.0), ("17", 1.0)}

    # update moves p2 from key 40 to 30; delete retires p3's row
    row = master.read("person").filter(F.col("id") == "p2").first()
    upd = spark.createDataFrame([("p2", "bob", 30, row["revision"])],
                                "id string, name string, age int, revision long")
    master.commit(master.begin().save("person", upd))
    master.commit(master.begin().mark_deleted("person", ["p3"]))
    vm.catch_up(checkpoint=cp)
    assert {(r["key"], r["value"]) for r in vm.reduced().collect()} == {("30", 2.0)}


def test_vertex_delete_retires_edge_view_rows(master, spark, tmp_path):
    edges = spark.createDataFrame(
        [("e1", "p1", "p2", 2.0), ("e2", "p2", "p3", 3.0)],
        "id string, src string, dst string, weight double")
    master.commit(master.begin().create("knows", edges))
    view = View(class_name="knows", name="by-src", kind="edge",
                map_fn=lambda df: df.select(
                    "id", F.col("src").alias("key"),
                    F.col("weight").alias("value")),
                reduce_agg=F.sum("value"))
    vm = ViewMaintainer(master, view, str(tmp_path / "et"))
    cp = str(tmp_path / "ecp")
    vm.catch_up(checkpoint=cp)
    assert vm.table().count() == 2

    # deleting vertex p3 makes e2 inactive -> its view row must retire
    master.commit(master.begin().mark_deleted("person", ["p3"]))
    vm.catch_up(checkpoint=cp)
    rows = vm.table().collect()
    assert [r["id"] for r in rows] == ["e1"]


def test_streaming_ingest_upserts(spark, tmp_path):
    """Event stream -> per-batch atomic upsert commits: last value per user
    wins across batches, revisions bump on update, epochs advance per batch."""
    from vivace_graph_v3_spark.streaming.ingest import upsert_stream

    reg = SchemaRegistry()
    reg.def_vertex("user", {"value": T.DoubleType()})
    vg = VersionedGraph(spark, reg, str(tmp_path / "g"))

    src = str(tmp_path / "src")
    batches = [
        [(1, 7, 1.5), (2, 8, 2.0)],
        [(3, 7, 9.0)],             # update user 7
    ]
    for rows in batches:
        (spark.createDataFrame(rows, "event_id long, user_id long, value double")
         .coalesce(1).write.mode("append").json(src))

    stream = (spark.readStream
              .schema("event_id long, user_id long, value double")
              .option("maxFilesPerTrigger", 1).json(src))

    def shape(batch):
        return batch.select(
            F.concat(F.lit("user:"), F.col("user_id")).alias("id"),
            F.col("value"))

    q = upsert_stream(stream, vg, "user", transform=shape,
                      checkpoint=str(tmp_path / "cp"))
    q.awaitTermination(120)

    rows = {r["id"]: (r["value"], r["revision"])
            for r in vg.read("user").collect()}
    assert rows["user:8"] == (2.0, 0)
    assert rows["user:7"][0] == 9.0 and rows["user:7"][1] >= 1


def test_upsert_batch_one_sided_and_empty_batches(spark, tmp_path):
    """The creates/saves split is decided by observation counts riding the
    single checkpoint job (not separate isEmpty probes): an empty batch
    must not commit (epoch unchanged), and one-sided batches must enqueue
    only the non-empty branch."""
    from vivace_graph_v3_spark.streaming.ingest import upsert_batch

    reg = SchemaRegistry()
    reg.def_vertex("user", {"name": T.StringType()})
    vg = VersionedGraph(spark, reg, str(tmp_path / "g"))
    mk = lambda rows: spark.createDataFrame(rows, "id string, name string")

    e1 = upsert_batch(vg, "user", mk([("u1", "a"), ("u2", "b")]))  # creates
    e2 = upsert_batch(vg, "user", mk([("u1", "a")]).limit(0))      # empty
    assert e2 == e1, "empty batch must not advance the epoch"
    e3 = upsert_batch(vg, "user", mk([("u1", "a2")]))              # saves only
    e4 = upsert_batch(vg, "user", mk([("u2", "b2"), ("u3", "c")]))  # mixed
    assert e1 < e3 < e4
    out = sorted((r["id"], r["name"], r["revision"])
                 for r in vg.read("user").collect())
    assert out == [("u1", "a2", 1), ("u2", "b2", 1), ("u3", "c", 0)]


def test_view_maintenance_equals_cold_recompute(master, spark, tmp_path):
    """Parity property vs the reference's view delete path
    (views.lisp:400-427): ANY interleaving of insert / update / delete /
    reinsert commits, maintained incrementally batch-by-batch, leaves the
    view table identical to a cold full_refresh over the final graph
    state — including ids that die and come back (delete-then-reinsert
    must not leave stale rows or drop re-emitted ones)."""
    import random

    rnd = random.Random(2026)
    vm = ViewMaintainer(master, _age_view(), str(tmp_path / "pt"))
    cp = str(tmp_path / "ptcp")
    vm.catch_up(checkpoint=cp)

    live = {"p1", "p2", "p3"}
    dead: set = set()
    next_id = 100
    for step in range(12):
        op = rnd.choice(["insert", "update", "delete", "reinsert"])
        if op == "insert":
            pid, next_id = f"p{next_id}", next_id + 1
            master.commit(master.begin().create("person", _people(
                spark, [(pid, f"n{pid}", rnd.randint(10, 60))])))
            live.add(pid)
        elif op == "update" and live:
            pid = rnd.choice(sorted(live))
            row = master.read("person").filter(F.col("id") == pid).first()
            upd = spark.createDataFrame(
                [(pid, row["name"], rnd.randint(10, 60), row["revision"])],
                "id string, name string, age int, revision long")
            master.commit(master.begin().save("person", upd))
        elif op == "delete" and live:
            pid = rnd.choice(sorted(live))
            master.commit(master.begin().mark_deleted("person", [pid]))
            live.discard(pid)
            dead.add(pid)
        elif op == "reinsert" and dead:
            pid = dead.pop()
            master.commit(master.begin().create("person", _people(
                spark, [(pid, f"re{pid}", rnd.randint(10, 60))])))
            live.add(pid)
        # maintain incrementally after EVERY commit (micro-batch per op)
        vm.catch_up(checkpoint=cp)

    incremental = {(r["id"], r["key"], r["value"])
                   for r in vm.table().collect()}
    cold = ViewMaintainer(master, _age_view(), str(tmp_path / "cold"))
    cold.full_refresh()
    recomputed = {(r["id"], r["key"], r["value"])
                  for r in cold.table().collect()}
    assert incremental == recomputed
    assert {r["id"] for r in vm.table().collect()} == live


def test_dedup_ingest_batches_and_stream(master, spark, tmp_path):
    """Streaming curation ingest: each batch dedups within itself and
    against the persisted index; only survivors land in the corpus and
    the index grows by exactly the survivors."""
    from vivace_graph_v3_spark.streaming.ingest import (
        dedup_ingest_batch, dedup_ingest_stream)

    d_a = "alpha beta gamma delta " * 8
    d_b = "one two three four five " * 8
    d_c = "totally different words entirely here " * 8
    idx = str(tmp_path / "idx")
    corp = str(tmp_path / "corpus")

    b1 = spark.createDataFrame(
        [(1, d_a), (2, d_a + "tail"), (3, d_b)], ["doc_id", "text"])
    s1 = dedup_ingest_batch(b1, idx, corp, threshold=0.5)
    assert s1["n_in"] == 3 and s1["n_batch_dups"] == 1
    assert s1["n_index_dups"] == 0 and s1["n_kept"] == 2

    # batch 2: doc 10 duplicates the already-ingested d_b; doc 11 is new
    b2 = spark.createDataFrame(
        [(10, d_b + "x"), (11, d_c)], ["doc_id", "text"])
    s2 = dedup_ingest_batch(b2, idx, corp, threshold=0.5)
    assert s2 == {"n_in": 2, "n_batch_dups": 0,
                  "n_index_dups": 1, "n_kept": 1}
    kept = {r.doc_id for r in spark.read.parquet(corp).collect()}
    assert kept == {1, 3, 11}
    assert spark.read.parquet(f"{idx}/side").count() == 3

    # same pipeline through a real streaming query
    src = str(tmp_path / "src")
    (spark.createDataFrame([(20, d_c + "y"), (21, "brand new content " * 9)],
                           ["doc_id", "text"])
     .coalesce(1).write.mode("append").json(src))
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).json(src))
    q = dedup_ingest_stream(stream, idx, corp,
                            checkpoint=str(tmp_path / "cp"), threshold=0.5)
    q.awaitTermination(120)
    kept = {r.doc_id for r in spark.read.parquet(corp).collect()}
    assert kept == {1, 3, 11, 21}  # 20 deduped against streamed-in 11


def test_index_frames_probe_uses_spark_reader(spark, tmp_path):
    """Index existence is probed via spark.read (works on HDFS/S3 URIs),
    not os.path.isdir (ADVICE r3): absent dir -> None, present -> loaded."""
    from vivace_graph_v3_spark.streaming.ingest import _index_frames

    missing = str(tmp_path / "nope")
    assert _index_frames(spark, missing) is None

    idx_dir = str(tmp_path / "idx")
    spark.range(3).selectExpr("id AS band", "id AS band_hash",
                              "id AS doc_id").write.parquet(
                                  f"{idx_dir}/postings")
    spark.range(3).selectExpr("id AS doc_id", "CAST(id AS STRING) AS text") \
        .write.parquet(f"{idx_dir}/side")
    assert _index_frames(spark, idx_dir) is not None


def test_scd2_incremental_matches_recompute(spark, tmp_path):
    """CDC micro-batches maintain the SCD2 dimension incrementally —
    including a LATE-ARRIVING change that splices into closed history —
    and the result equals scd2_build over the full log."""
    from vivace_graph_v3_spark.operators.scd import scd2_build
    from vivace_graph_v3_spark.streaming.ingest import (
        scd2_apply_batch, scd2_apply_stream)

    dim = str(tmp_path / "dim")
    schema = "k long, t long, attr string"
    b1 = spark.createDataFrame(
        [(1, 10, "a"), (1, 30, "b"), (2, 10, "x")], schema)
    s1 = scd2_apply_batch(b1, dim, "k", "t", ["attr"])
    assert s1 == {"n_changes": 3, "n_affected_keys": 2, "n_dim_rows": 3}

    # batch 2: late change for key 1 at t=20 (splices between 10 and 30),
    # fresh key 3; key 2 untouched
    b2 = spark.createDataFrame([(1, 20, "c"), (3, 5, "z")], schema)
    s2 = scd2_apply_batch(b2, dim, "k", "t", ["attr"])
    assert s2["n_affected_keys"] == 2 and s2["n_dim_rows"] == 5

    full_log = b1.unionByName(b2)
    want = {tuple(r) for r in scd2_build(
        full_log, "k", "t", ["attr"], tiebreak_cols=["attr"]).collect()}
    got = {tuple(r) for r in spark.read.parquet(dim).collect()}
    assert got == want
    # the spliced interval: key 1 is 'c' over [20, 30)
    assert (1, "c", 20, 30, 2, False) in got

    # same pipeline through a real streaming query
    src = str(tmp_path / "src")
    (spark.createDataFrame([(2, 40, "y")], schema)
     .coalesce(1).write.mode("append").json(src))
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).json(src))
    q = scd2_apply_stream(stream, dim, "k", "t", ["attr"],
                          checkpoint=str(tmp_path / "cp"))
    q.awaitTermination(120)
    rows = {tuple(r) for r in spark.read.parquet(dim).collect()}
    assert (2, "y", 40, None, 2, True) in rows
    assert (2, "x", 10, 40, 1, False) in rows


def test_bloom_dedup_stream_two_batches(spark, tmp_path):
    """Two micro-batches through the bloom-gated ingest: keys repeated
    from batch 1 must tag 'dup' in batch 2 (no false 'new'), and the
    persisted state stays bounded by m_bits however many keys arrive."""
    import time

    from pyspark.sql import functions as F

    from vivace_graph_v3_spark.streaming.ingest import bloom_dedup_stream

    src = tmp_path / "src"
    bits = tmp_path / "bits"
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    src.mkdir()
    b1 = spark.range(0, 100).select(F.col("id").alias("event_id"))
    b1.write.mode("overwrite").parquet(str(src / "b1.parquet"))

    stream = (spark.readStream.schema("event_id long")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*"))
    q = bloom_dedup_stream(stream, str(bits), str(out),
                           checkpoint=str(ck), m_bits=4096)
    try:
        q.processAllAvailable()
        # batch 2: 50 repeats + 50 fresh
        b2 = (spark.range(50, 150)
              .select(F.col("id").alias("event_id")))
        b2.write.mode("overwrite").parquet(str(src / "b2.parquet"))
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(str(out))
    # all 100 batch-1 keys tagged new (empty filter at first sight)
    first = got.filter(F.col("event_id") < 50)
    assert first.filter(F.col("status") == "dup").count() == 0
    # repeated keys 50..99 appear twice: once new (b1), once dup (b2)
    rep = got.filter((F.col("event_id") >= 50) & (F.col("event_id") < 100))
    assert rep.filter(F.col("status") == "dup").count() == 50
    # fresh keys 100..149: no false 'dup' is NOT guaranteed (bloom FPR),
    # but false 'new' for seen keys is impossible; and state is bounded
    bits_df = spark.read.parquet(str(bits / "bits"))
    assert bits_df.count() <= 4096


def test_cc_label_maintenance_batches_and_stream(spark, tmp_path):
    """Incremental CC label store across micro-batches: singletons
    appear, merges repair only touched components, and the final labels
    equal from-scratch components on the union edge set."""
    from vivace_graph_v3_spark.streaming.ingest import (cc_apply_batch,
                                                        cc_apply_stream)

    labels = str(tmp_path / "labels")
    schema = "src string, dst string"
    b1 = spark.createDataFrame([("a", "b"), ("c", "d")], schema)
    s1 = cc_apply_batch(b1, labels)
    assert s1 == {"n_edges": 2, "n_new_vertices": 4, "n_vertices": 4}
    got = {r["id"]: r["comp"]
           for r in spark.read.parquet(labels).collect()}
    assert got == {"a": "a", "b": "a", "c": "c", "d": "c"}

    # batch 2 bridges the two components and introduces a new vertex
    b2 = spark.createDataFrame([("b", "c"), ("e", "e")], schema)
    s2 = cc_apply_batch(b2, labels)
    assert s2["n_new_vertices"] == 1 and s2["n_vertices"] == 5
    got = {r["id"]: r["comp"]
           for r in spark.read.parquet(labels).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "e"}

    # batch 3 through a real streaming query: e joins the big component
    src = str(tmp_path / "src")
    (spark.createDataFrame([("d", "e")], schema)
     .coalesce(1).write.mode("append").json(src))
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).json(src))
    q = cc_apply_stream(stream, labels, checkpoint=str(tmp_path / "cp"))
    q.awaitTermination(120)
    got = {r["id"]: r["comp"]
           for r in spark.read.parquet(labels).collect()}
    assert got == {k: "a" for k in "abcde"}
