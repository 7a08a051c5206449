"""Blocked fuzzy entity matching."""

from vivace_graph_v3_spark.operators.entity import blocked_fuzzy_pairs


def test_blocking_and_edit_threshold(spark):
    rows = [
        (1, "B1", "smith john"), (2, "B1", "smith jon"),   # edit 1
        (3, "B1", "wholly other"),                          # no match
        (4, "B2", "smith john"),   # same name, DIFFERENT block: no pair
        (5, "B2", "smith johm"),   # edit 1 inside B2
    ]
    df = spark.createDataFrame(rows, "id long, blk string, name string")
    got = {(r.key_a, r.key_b): r.edit
           for r in blocked_fuzzy_pairs(
               df, key_col="id", name_col="name",
               block_cols=["blk"], max_edit=2).collect()}
    assert got == {(1, 2): 1, (4, 5): 1}


def test_block_cap_drops_hot_blocks(spark):
    rows = [(i, "hot", f"name{i}") for i in range(20)] \
        + [(100, "cold", "abc"), (101, "cold", "abd")]
    df = spark.createDataFrame(rows, "id long, blk string, name string")
    got = blocked_fuzzy_pairs(df, key_col="id", name_col="name",
                              block_cols=["blk"], max_edit=2,
                              block_cap=10).collect()
    assert {(r.key_a, r.key_b) for r in got} == {(100, 101)}
