"""Property-based tests (hypothesis) over the query surface — SURVEY §5(c):
operators whose semantics must hold for ARBITRARY parameters, not just the
fixture values used in the example-based tests.

Kept to few examples per property: every example compiles and runs a real
Spark plan (deadline disabled for JVM scheduling jitter).
"""

import math

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vivace_graph_v3_spark.query.builder import select, select_count

SLOW = settings(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.too_slow,
                                       HealthCheck.function_scoped_fixture])


@SLOW
@given(thr=st.floats(min_value=-1000, max_value=10000,
                     allow_nan=False, allow_infinity=False))
def test_threshold_filter_matches_oracle(tpch, duck, thr):
    """slot-compare goal == SQL predicate for arbitrary thresholds,
    including ones outside the data range (empty results)."""
    df = select(tpch, ["?c"], [
        ("is-a", "?c", "customer"),
        ("slot", "?c", "c_acctbal", "?b"),
        (">", "?b", thr),
    ])
    want = duck.execute(
        "SELECT count(*) FROM customer WHERE c_acctbal > ?", [thr]).fetchone()[0]
    assert df.count() == want


@SLOW
@given(skip=st.integers(min_value=0, max_value=60),
       limit=st.integers(min_value=0, max_value=60))
def test_limit_skip_composition(tpch, duck, skip, limit):
    """select :skip/:limit arithmetic (prologc.lisp:825-831) for arbitrary
    page windows, including windows past the end of the data."""
    total = duck.execute("SELECT count(*) FROM nation").fetchone()[0]
    df = select(tpch, ["?n"], [("is-a", "?n", "nation")],
                skip=skip, limit=limit)
    assert df.count() == max(0, min(total - skip, limit))


@SLOW
@given(seg=st.sampled_from(["BUILDING", "AUTOMOBILE", "MACHINERY",
                            "HOUSEHOLD", "FURNITURE"]),
       thr=st.floats(min_value=0, max_value=5000,
                     allow_nan=False, allow_infinity=False))
def test_conjunction_commutes_with_filter_order(tpch, seg, thr):
    """Goal conjunction is declarative: swapping two independent filter
    goals cannot change the solution multiset (the upgrade over the
    reference's order-as-execution-plan, SURVEY §4.1)."""
    base = [("is-a", "?c", "customer"),
            ("slot", "?c", "c_mktsegment", "?s"),
            ("slot", "?c", "c_acctbal", "?b")]
    g1 = base + [("==", "?s", seg), (">", "?b", thr)]
    g2 = base + [(">", "?b", thr), ("==", "?s", seg)]
    a = sorted(r["c"] for r in select(tpch, ["?c"], g1).collect())
    b = sorted(r["c"] for r in select(tpch, ["?c"], g2).collect())
    assert a == b


@SLOW
@given(lo=st.floats(min_value=0, max_value=2500, allow_nan=False),
       hi=st.floats(min_value=2500, max_value=6000, allow_nan=False))
def test_not_complements_range(tpch, duck, lo, hi):
    """Negation-as-failure is a true complement: rows in [lo,hi] plus
    rows NOT in [lo,hi] == all rows, for arbitrary ranges."""
    inside = select_count(tpch, [
        ("is-a", "?c", "customer"),
        ("slot", "?c", "c_acctbal", "?b"),
        (">=", "?b", lo), ("<=", "?b", hi),
    ])
    outside = select_count(tpch, [
        ("is-a", "?c", "customer"),
        ("slot", "?c", "c_acctbal", "?b"),
        ("not", (">=", "?b", lo), ("<=", "?b", hi)),
    ])
    total = duck.execute("SELECT count(*) FROM customer").fetchone()[0]
    assert inside + outside == total


_VARIANT_VALUES = st.one_of(
    st.none(),
    st.booleans(),
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False, allow_infinity=False),
    st.text(alphabet="abcXYZ 019", max_size=8),
    st.lists(st.floats(min_value=-1e5, max_value=1e5,
                       allow_nan=False, allow_infinity=False)
             .map(lambda x: round(x, 3)),
             min_size=0, max_size=4),
)


def _py_term_key(v):
    """Driver-side reference comparator for the cross-type total order
    (utilities.lisp:237-309): null < bool < number < string < list."""
    if v is None:
        return (0,)
    if isinstance(v, bool):
        return (1, v)
    if isinstance(v, (int, float)):
        return (2, float(v))
    if isinstance(v, str):
        return (4, v)
    return (5, [float(x) for x in v])


@SLOW
@given(vals=st.lists(_VARIANT_VALUES, min_size=1, max_size=12))
def test_variant_sort_matches_python_reference(spark, vals):
    """Spark-side variant_sort_key ordering == the Python reference
    comparator for arbitrary heterogeneous key lists (timestamps excluded:
    hypothesis datetimes add tz noise orthogonal to the order)."""
    from vivace_graph_v3_spark.functions.term_order import (
        variant_lit, variant_sort_key)

    frames = [
        spark.range(1).select(F.lit(i).alias("i"),
                              variant_lit(v).alias("key"))
        for i, v in enumerate(vals)
    ]
    df = frames[0]
    for f in frames[1:]:
        df = df.unionByName(f)
    got = [r["i"] for r in
           df.orderBy(variant_sort_key(F.col("key")), "i").collect()]
    # stable sort by the python reference key, index as tiebreak
    want = [i for i, _ in sorted(enumerate(vals),
                                 key=lambda t: (_py_term_key(t[1]), t[0]))]
    assert got == want, (vals, got, want)


@SLOW
@given(chunk=st.integers(min_value=1, max_value=40),
       stride_frac=st.floats(min_value=0.25, max_value=1.0),
       words=st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
                      min_size=0, max_size=120))
def test_chunk_tokens_covers_exactly(spark, chunk, stride_frac, words):
    """For ARBITRARY chunk/stride (stride <= chunk) and texts: chunks cover
    every token position exactly once at each window start, window starts
    step by stride, and re-concatenating stride-prefixes + the final chunk
    reconstructs the document."""
    from vivace_graph_v3_spark.pipeline.text import chunk_tokens

    stride = max(1, int(chunk * stride_frac))
    df = spark.createDataFrame([(1, " ".join(words))],
                               "doc_id long, text string")
    rows = sorted(chunk_tokens(df, chunk_size=chunk, stride=stride).collect(),
                  key=lambda r: r["chunk_idx"])
    n = len(words)
    if n == 0:
        assert rows == []
        return
    import math
    assert len(rows) == math.ceil(n / stride)
    rebuilt = []
    for i, r in enumerate(rows):
        toks = r["chunk_text"].split(" ") if r["chunk_text"] else []
        assert r["chunk_idx"] == i
        assert toks == words[i * stride: i * stride + chunk]
        assert r["n_chunk_tokens"] == len(toks)
        rebuilt.extend(toks if i == len(rows) - 1 else toks[:stride])
    assert rebuilt == words


@SLOW
@given(rate=st.floats(min_value=0.0, max_value=1.0),
       buckets=st.sampled_from([100, 1000, 10000]))
def test_deterministic_sample_monotone(spark, rate, buckets):
    """Hash-bucket sampling is monotone in rate (a higher-rate selection is
    a superset) and exact at the rate endpoints."""
    from vivace_graph_v3_spark.pipeline.text import deterministic_sample

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    kept = {r["doc_id"] for r in
            deterministic_sample(df, rate, buckets=buckets).collect()}
    half = {r["doc_id"] for r in
            deterministic_sample(df, rate / 2, buckets=buckets).collect()}
    assert half <= kept
    if rate == 0.0:
        assert kept == set()
    if rate == 1.0:
        assert len(kept) == 500


def test_roc_auc_matches_bruteforce_reference(spark):
    """Differential: exact AUC operator vs an O(P*N) pure-Python
    pairwise reference (ties worth 1/2) on random labeled scores."""
    import random

    from vivace_graph_v3_spark.operators.profile import roc_auc

    rng = random.Random(7)
    for trial in range(3):
        rows = [(rng.randint(0, 20), rng.random() < 0.4)
                for _ in range(rng.randint(5, 60))]
        if not any(y for _, y in rows) or all(y for _, y in rows):
            rows += [(1, True), (2, False)]
        pos = [s for s, y in rows if y]
        neg = [s for s, y in rows if not y]
        wins = sum(1.0 if p > n else 0.5 if p == n else 0.0
                   for p in pos for n in neg)
        expected = wins / (len(pos) * len(neg))
        df = spark.createDataFrame(rows, "s long, y boolean")
        got = roc_auc(df, score_col="s", label_col="y").first().auc
        assert abs(got - expected) < 1.5e-6, (trial, got, expected)


def test_t_closeness_matches_bruteforce_reference(spark):
    """Differential: ordered-EMD t-closeness vs a pure-Python CDF walk
    on random (class, value) data."""
    import random
    from fractions import Fraction

    from vivace_graph_v3_spark.operators.profile import t_closeness

    rng = random.Random(11)
    rows = [(f"c{rng.randint(0, 3)}", rng.randint(0, 5))
            for _ in range(200)]
    df = spark.createDataFrame(rows, "q string, v long")
    got = {r.q: r.t_ppm for r in t_closeness(df, ["q"], "v").collect()}

    values = sorted({v for _, v in rows})
    n_g = len(rows)
    for cls in {q for q, _ in rows}:
        cvs = [v for q, v in rows if q == cls]
        n_c = len(cvs)
        cum_c = cum_g = 0
        total = Fraction(0)
        for v in values:
            cum_c += sum(1 for x in cvs if x == v)
            cum_g += sum(1 for _, x in rows if x == v)
            total += abs(Fraction(cum_c, n_c) - Fraction(cum_g, n_g))
        t = total / (len(values) - 1)
        expected_ppm = int((t * 2_000_000 + 1) // 2)  # round half up
        assert got[cls] == expected_ppm, (cls, got[cls], expected_ppm)


def test_mad_outliers_matches_bruteforce_reference(spark):
    """Differential: value-grid median/MAD vs sorted-list lower medians
    in pure Python."""
    import random

    from vivace_graph_v3_spark.operators.product_analytics import (
        mad_outliers)

    rng = random.Random(13)
    rows = [("t", round(rng.uniform(0, 50), 2)) for _ in range(300)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    r = mad_outliers(df).first()

    cents = sorted(int(round(v * 100)) for _, v in rows)
    n = len(cents)
    lower_median = cents[(n - 1) // 2] if n % 2 else cents[n // 2 - 1]
    devs = sorted(abs(c - lower_median) for c in cents)
    mad = devs[(n - 1) // 2] if n % 2 else devs[n // 2 - 1]
    n_out = sum(1 for c in cents if abs(c - lower_median) * 10 > 35 * mad)
    assert (r.median_cents, r.mad_cents, r.n_outliers) == \
        (lower_median, mad, n_out)


@SLOW
@given(xs=st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                   min_size=1, max_size=24))
def test_isqrt_col_matches_math_isqrt(spark, xs):
    """The exact-integer-sqrt column (pipeline/text._isqrt_col) equals
    math.isqrt on arbitrary int64 inputs — the kernel under the
    temperature-mix / negative-sampling exactness claims."""
    import math

    from vivace_graph_v3_spark.pipeline.text import _isqrt_col

    df = spark.createDataFrame([(i, v) for i, v in enumerate(xs)],
                               "i long, x long")
    got = {r["i"]: r["s"] for r in
           df.select("i", _isqrt_col(F.col("x")).alias("s")).collect()}
    for i, v in enumerate(xs):
        assert got[i] == math.isqrt(v), v


@SLOW
@given(fs=st.lists(st.integers(min_value=1, max_value=2_000_000),
                   min_size=1, max_size=12))
def test_nested_isqrt_is_exact_fourth_root(spark, fs):
    """floor(sqrt(floor(sqrt(f^3)))) == floor(f^0.75) exactly — the
    negative-sampling 3/4-power identity, on the documented f < 2^21
    domain."""
    import math

    from vivace_graph_v3_spark.pipeline.text import _isqrt_col

    df = spark.createDataFrame([(i, f) for i, f in enumerate(fs)],
                               "i long, f long")
    expr = _isqrt_col(_isqrt_col(F.col("f") * F.col("f") * F.col("f")))
    got = {r["i"]: r["p"] for r in df.select("i", expr.alias("p")).collect()}
    for i, f in enumerate(fs):
        k = got[i]
        assert k ** 4 <= f ** 3 < (k + 1) ** 4, f
