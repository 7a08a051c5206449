"""Cross-type total order (utilities.lisp:237-309 less-than) — heterogeneous
view keys sort null < boolean < number < timestamp < string < list, with
the natural within-type order, entirely via Catalyst expressions."""

import datetime as dt

from pyspark.sql import functions as F

from vivace_graph_v3_spark.functions.term_order import (
    variant_key, variant_lit, variant_sort_key)
from vivace_graph_v3_spark.views import def_view, map_view


def _mixed_df(spark):
    """One row per python value, in the reference's expected order."""
    vals = [
        (0, None),
        (1, False), (2, True),
        (3, -9.0), (4, -1.0), (5, 0.0), (6, 1.0), (7, 1.5), (8, 10.0),
        (9, dt.datetime(2020, 1, 1)), (10, dt.datetime(2024, 6, 1)),
        (11, ""), (12, "apple"), (13, "apricot"), (14, "banana"),
        (15, [1.0]), (16, [1.0, -5.0]), (17, [1.0, 2.0]), (18, [2.0]),
    ]
    frames = []
    for i, v in vals:
        frames.append(spark.range(1).select(F.lit(i).alias("expected_pos"),
                                            variant_lit(v).alias("key")))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def test_variant_sort_key_total_order(spark):
    df = _mixed_df(spark)
    got = (df.orderBy(variant_sort_key(F.col("key")))
           .select("expected_pos").collect())
    assert [r.expected_pos for r in got] == list(range(19))


def test_variant_sort_key_desc(spark):
    df = _mixed_df(spark)
    got = (df.orderBy(variant_sort_key(F.col("key")).desc())
           .select("expected_pos").collect())
    assert [r.expected_pos for r in got] == list(range(18, -1, -1))


def test_mixed_view_cursor_order_and_range(tpch, spark):
    # mixed-key view over customers: key type depends on c_custkey % 4 —
    # number (acctbal), string (mktsegment), boolean (acctbal>0), null
    def map_fn(df):
        k = F.col("c_custkey") % 4
        return df.select(
            "id",
            variant_key(
                bool_v=F.when(k == 0, F.col("c_acctbal") > 0),
                num_v=F.when(k == 1, F.col("c_acctbal")),
                str_v=F.when(k == 2, F.col("c_mktsegment")),
            ).alias("key"),
            F.col("c_custkey").alias("value"))

    def_view("customer", "mixed_key", map_fn, mixed=True)
    rows = map_view(tpch, "customer", "mixed_key").collect()
    ranks = []
    for r in rows:
        k = r.key
        if k.bool_v is not None:
            ranks.append((1, float(k.bool_v), ""))
        elif k.num_v is not None:
            ranks.append((2, k.num_v, ""))
        elif k.str_v is not None:
            ranks.append((4, 0.0, k.str_v))
        else:
            ranks.append((0, 0.0, ""))
    assert ranks == sorted(ranks), "cursor must emit cross-type order"
    # ranks present: null, bool, number, string
    assert {r[0] for r in ranks} == {0, 1, 2, 4}

    # range scan [start=0.0 (number), end='ZZZZ' (string)] spans numbers
    # and strings but excludes nulls and booleans
    ranged = map_view(tpch, "customer", "mixed_key",
                      start_key=0.0, end_key="ZZZZ").collect()
    got_ranks = {2 if r.key.num_v is not None else 4 for r in ranged}
    assert got_ranks <= {2, 4}
    n_num_nonneg = sum(1 for rk in ranks if rk[0] == 2 and rk[1] >= 0.0)
    n_str = sum(1 for rk in ranks if rk[0] == 4)
    assert len(ranged) == n_num_nonneg + n_str

    # exact-key lookup through the variant encoder
    exact = map_view(tpch, "customer", "mixed_key", key=True).collect()
    assert all(r.key.bool_v is True for r in exact)
    assert len(exact) == sum(1 for rk in ranks if rk == (1, 1.0, ""))


def test_array_key_negative_precision_and_overflow(spark):
    """Negative elements differing at the 6th decimal must stay distinct
    (exact decimal complement, not a double-domain offset), and an
    out-of-range element renders as a trailing sentinel instead of
    silently vanishing from the key."""
    vals = [
        (0, [-2e-5]), (1, [-1e-5]), (2, [0.0]), (3, [1e-5]),
        (4, [1e16]),          # overflow -> sentinel, sorts after in-range
    ]
    frames = [spark.range(1).select(F.lit(i).alias("i"),
                                    variant_lit(v).alias("key"))
              for i, v in vals]
    df = frames[0]
    for f in frames[1:]:
        df = df.unionByName(f)
    got = [r["i"] for r in
           df.orderBy(variant_sort_key(F.col("key"))).collect()]
    assert got == [0, 1, 2, 3, 4]


def test_mixed_reduce_view_groups(tpch, spark):
    """Reduce views group ON the variant key (struct groupBy) and the
    reduced cursor emits cross-type key order."""
    def map_fn(df):
        k = F.col("c_custkey") % 3
        return df.select(
            "id",
            variant_key(
                num_v=F.when(k == 0, F.round(F.col("c_acctbal") / 1000)),
                str_v=F.when(k == 1, F.col("c_mktsegment")),
            ).alias("key"),
            F.lit(1).alias("value"))

    def_view("customer", "mixed_reduce", map_fn, mixed=True,
             reduce_agg=F.sum("value"))
    from vivace_graph_v3_spark.views import map_reduced_view
    rows = map_reduced_view(tpch, "customer", "mixed_reduce").collect()
    # groups: null keys collapse to one group, then numbers, then segments
    ranks = []
    total = 0
    for r in rows:
        k = r.key
        total += r.value
        if k.num_v is not None:
            ranks.append((2, k.num_v, ""))
        elif k.str_v is not None:
            ranks.append((4, 0.0, k.str_v))
        else:
            ranks.append((0, 0.0, ""))
    assert ranks == sorted(ranks)
    assert sum(1 for rk in ranks if rk[0] == 0) == 1  # one null group
    # every customer contributes exactly once (SF-independent)
    assert total == tpch.scan_vertices("customer").count()
