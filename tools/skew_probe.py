"""Adversarial SKEW probe (VERDICT r6 item 5): the 10x scale probe uses
key-shifted disjoint copies, which AQE splits cleanly — a real 100 TB
corpus has power-law keys. This probe 10x-replicates the FACT tables
into the SAME key space with one hot key holding ~50% of rows, and
times the shuffle-heaviest ops base-vs-hot:

- orders/lineitem: o_orderkey/l_orderkey shift per copy (join keys stay
  1:1 — fanout would measure a different pathology), but o_custkey of
  5/10 copies is redirected to ONE customer and l_partkey of 5/10
  copies to ONE part. `parts_per_customer` gets a 50%-of-orders
  customer; `graph_pagerank` gets a hub vertex holding ~50% of
  `contains` in-edges (and the hot customer's `placed` out-edges).
- events: event_id shifts, user_id of 5/10 copies -> ONE user:
  `events_latest_per_user` sees a user owning half the corpus.
- orders_global_rank: 10x rows where every o_totalprice value now has
  10 ties — the range-partitioner stressor (ties are split by the
  orderkey tiebreak in the sort key; this verifies it).
- documents: doc_id shifts, text of 5/10 copies -> ONE hot text: a
  single LSH bucket holding 50% of the corpus. The clique candidate
  join is quadratic in that bucket (25,000^2/2 ~ 3e8 pairs at 10x
  sf0.1), so the probe times the capped star path
  (minhash max_bucket=64, see pipeline/dedup.py) at 10x, and
  demonstrates the uncapped blowup at 1x only (uncapped-10x would be
  the measurement of a plan we explicitly do not ship at scale).

Emits one JSON line: per-op base_s / hot_s / ratio (+ the dedup
capped/uncapped contrast) for SCALING.md.

Run: python tools/skew_probe.py [n_copies]   (writes under /tmp)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
SHIFT = 10_000_000

PROBES = ["parts_per_customer", "events_latest_per_user",
          "orders_global_rank", "graph_pagerank", "dedup_minhash_lsh"]


def build(spark, out_dir: str, n_copies: int) -> dict:
    from pyspark.sql import functions as F

    hot = {}
    hot["custkey"] = spark.read.parquet(f"{SRC}/customer.parquet") \
        .agg(F.min("c_custkey")).first()[0]
    hot["partkey"] = spark.read.parquet(f"{SRC}/part.parquet") \
        .agg(F.min("p_partkey")).first()[0]
    hot["user"] = spark.read.parquet(f"{SRC}/events.parquet") \
        .agg(F.min("user_id")).first()[0]
    hot["text_doc"] = spark.read.parquet(f"{SRC}/documents.parquet") \
        .orderBy("doc_id").select("text").first()[0]

    def replicate(table, shift_cols, redirect):
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        copies = []
        for i in range(n_copies):
            c = df
            for k in shift_cols:
                c = c.withColumn(k, F.col(k) + F.lit(i * SHIFT))
            if i < n_copies // 2:
                for col, val in redirect.items():
                    c = c.withColumn(col, F.lit(val).cast(dict(df.dtypes)[col]))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")

    replicate("orders", ["o_orderkey"], {"o_custkey": hot["custkey"]})
    replicate("lineitem", ["l_orderkey"], {"l_partkey": hot["partkey"]})
    replicate("events", ["event_id"], {"user_id": hot["user"]})
    replicate("documents", ["doc_id"], {"text": hot["text_doc"]})
    # dims stay in the SAME key space: facts of every copy reference them
    for t in ["customer", "part", "supplier", "nation", "region",
              "embeddings"]:
        spark.read.parquet(f"{SRC}/{t}.parquet") \
            .write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    return hot


def timed(fn, *a, **kw):
    t0 = time.time()
    n = fn(*a, **kw).count()
    return round(time.time() - t0, 3), n


def main() -> int:
    from pyspark.sql import functions as F  # noqa: F401

    from vivace_graph_v3_spark import entry_queries as eq
    from vivace_graph_v3_spark.pipeline.dedup import minhash_dedup_pairs
    from vivace_graph_v3_spark.session import get_spark

    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = sys.argv[2:] or PROBES
    spark = get_spark("skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    qs = eq.queries()

    tmp = tempfile.mkdtemp(prefix="vgv3_skew_")
    out: dict = {"n_copies": n_copies, "hot_share": 0.5, "ops": {}}
    try:
        t0 = time.time()
        build(spark, tmp, n_copies)
        print(f"# build hot {n_copies}x: {round(time.time() - t0, 1)}s",
              file=sys.stderr)

        for name in only:
            if name == "dedup_minhash_lsh":
                continue  # handled below (capped path)
            bs, bn = timed(qs[name], spark, SRC)
            hs, hn = timed(qs[name], spark, tmp)
            out["ops"][name] = {"base_s": bs, "hot_s": hs,
                                "ratio": round(hs / bs, 2),
                                "rows": [bn, hn]}
            print(f"# {name}: base {bs}s ({bn} rows) -> hot {hs}s "
                  f"({hn} rows), ratio {out['ops'][name]['ratio']}",
                  file=sys.stderr)

        if "dedup_minhash_lsh" in only:
            docs = spark.read.parquet(f"{SRC}/documents.parquet") \
                .select("doc_id", "text")
            hotdocs = spark.read.parquet(f"{tmp}/documents.parquet") \
                .select("doc_id", "text")
            # uncapped clique blowup, demonstrated at the smallest scale
            # where it is still runnable: 1k docs of ONE text (copy 0's
            # head) + one normal copy -> a 1k-wide bucket, ~500k clique
            # pairs each carrying an exact-jaccard verification
            dmin = docs.agg(F.min("doc_id")).first()[0]
            demo = (hotdocs.filter(F.col("doc_id") < dmin + 1000)
                    .unionByName(hotdocs.filter(
                        (F.col("doc_id") >= 5 * SHIFT)
                        & (F.col("doc_id") < 6 * SHIFT))))
            u1, un1 = timed(minhash_dedup_pairs, demo, threshold=0.5)
            c1, cn1 = timed(minhash_dedup_pairs, demo, threshold=0.5,
                            max_bucket=64)
            bs, bn = timed(minhash_dedup_pairs, docs, threshold=0.5,
                           max_bucket=64)
            hs, hn = timed(minhash_dedup_pairs, hotdocs, threshold=0.5,
                           max_bucket=64)
            out["ops"]["dedup_minhash_lsh"] = {
                "base_capped_s": bs, "hot10x_capped_s": hs,
                "ratio_capped": round(hs / bs, 2),
                "demo_uncapped_s": u1, "demo_capped_s": c1,
                "demo_uncapped_pairs": un1, "demo_capped_pairs": cn1,
                "rows": [bn, hn]}
            print(f"# dedup: 1k-hot demo uncapped {u1}s ({un1} pairs) vs "
                  f"capped {c1}s ({cn1} pairs); 10x-hot capped {hs}s vs "
                  f"base {bs}s -> ratio {round(hs / bs, 2)}", file=sys.stderr)

        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
