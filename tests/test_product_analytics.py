"""Funnel + cohort retention over a hand-built event log."""

from datetime import datetime

from pyspark.sql import functions as F

from vivace_graph_v3_spark.operators.product_analytics import (
    cohort_retention, funnel)


def _ev(spark, rows):
    # (user, type, day_offset) -> nanos timestamps anchored at a Monday
    base = 19723  # 2024-01-01, a Monday (epoch days)
    data = [(u, t, (base * 86_400 + off * 3_600) * 1_000_000_000)
            for u, t, off in rows]
    return spark.createDataFrame(data, "user_id long, event_type string, ts long")


def test_funnel_ordering_and_span(spark):
    ev = _ev(spark, [
        (1, "view", 0), (1, "click", 1), (1, "purchase", 2),   # converts all
        (2, "view", 0), (2, "purchase", 1),                    # skips click
        (3, "click", 0), (3, "view", 1),                       # click BEFORE view
        (4, "view", 0), (4, "click", 24 * 8),                  # outside 7d span
    ])
    got = {r.step_name: (r.n_users, r.conversion)
           for r in funnel(ev, ["view", "click", "purchase"],
                           max_span_days=7).collect()}
    assert got["view"] == (4, 1.0)
    assert got["click"] == (1, 0.25)     # only user 1 clicks after viewing in-span
    assert got["purchase"] == (1, 0.25)


def test_cohort_retention_triangle(spark):
    ev = _ev(spark, [
        (1, "view", 0), (1, "view", 24 * 7), (1, "view", 24 * 14),
        (2, "view", 24 * 7), (2, "view", 24 * 21),
    ])
    got = {(str(r.cohort_week), r.week_offset): r.n_users
           for r in cohort_retention(ev).collect()}
    assert got[("2024-01-01", 0)] == 1
    assert got[("2024-01-01", 1)] == 1
    assert got[("2024-01-01", 2)] == 1
    assert got[("2024-01-08", 0)] == 1
    assert got[("2024-01-08", 2)] == 1
    assert ("2024-01-08", 1) not in got


def test_events_burstiness_entry_fano_semantics(spark):
    """Fano factor from integer moments: uniform daily activity -> 0;
    bursty activity -> positive; single-active-day users -> 0."""
    import pyspark.sql.functions as F

    from vivace_graph_v3_spark.entry_queries import q_events_burstiness

    # build a tiny events parquet with controlled daily counts
    import tempfile
    tmp = tempfile.mkdtemp(prefix="vgv3burst_")
    day_ns = 86_400_000_000_000
    rows = []
    # uniform: 2 events/day for 5 days; bursty: 9 on one day, 1 on another
    for d in range(5):
        rows += [("u_uniform", d * day_ns + i) for i in range(2)]
    rows += [("u_bursty", 0 * day_ns + i) for i in range(9)]
    rows += [("u_bursty", 1 * day_ns)]
    rows += [("u_one", 3 * day_ns)]
    (spark.createDataFrame(rows, "user_id string, ns long")
     .select("user_id",
             F.timestamp_micros((F.col("ns") / 1000).cast("long"))
             .alias("ts"),
             F.lit("view").alias("event_type"),
             F.lit("{}").alias("props"),
             F.monotonically_increasing_id().alias("event_id"))
     .write.mode("overwrite").parquet(f"{tmp}/events.parquet"))
    got = {r.user_id: r for r in q_events_burstiness(spark, tmp).collect()}
    assert got["u_uniform"].fano == 0.0
    assert got["u_one"].fano == 0.0 and got["u_one"].n_days == 1
    # bursty: n=2, S1=10, S2=82 -> (2*82-100)/(2*10) = 64/20 = 3.2
    assert got["u_bursty"].fano == 3.2


def test_cusum_changepoint_locates_level_shift(spark):
    """20-day series with a clean level shift at day 11: CUSUM magnitude
    peaks on the last pre-shift day (the classic single-change locator);
    a flat series peaks at |dev| = 0 arbitrarily early."""
    import datetime

    from vivace_graph_v3_spark.operators.product_analytics import (
        cusum_changepoint)

    rows = []
    for d in range(20):
        ts = datetime.datetime(2024, 1, 1 + d)
        rows.append((ts, "shifted", 10.0 if d < 10 else 20.0))
        rows.append((ts, "flat", 5.0))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    got = {r.event_type: r for r in cusum_changepoint(df).collect()}
    assert got["shifted"].change_day == "2024-01-10"
    # scaled units 1e4/unit: s_pre=1e5, total=3e6, n=20;
    # cusum(day10) = 10*(1e5*20 - 3e6) = -1e7
    assert got["shifted"].peak_dev == -10000000
    assert got["shifted"].n_days == 20
    assert got["flat"].peak_dev == 0 and got["flat"].change_day == "2024-01-01"


def test_cohort_ltv_triangle(spark):
    from vivace_graph_v3_spark.operators.product_analytics import cohort_ltv

    orders = spark.createDataFrame(
        [(1, datetime(2024, 1, 5), 10.005),    # cohort 2024-01, offset 0
         (1, datetime(2024, 3, 1), 20.0),      # offset 2
         (2, datetime(2024, 3, 10), 5.0),      # cohort 2024-03, offset 0
         (2, datetime(2024, 3, 20), 7.0)],     # same month, same cell
        "o_custkey long, o_orderdate timestamp, o_totalprice double")
    got = {(r.cohort_month, r.month_offset): (r.revenue_cents, r.n_customers)
           for r in cohort_ltv(orders).collect()}
    # 10.005 * 100 + 0.5 -> floor(1001.0) = 1001 (half-up cents)
    assert got[("2024-01", 0)] == (1001, 1)
    assert got[("2024-01", 2)] == (2000, 1)
    assert got[("2024-03", 0)] == (1200, 1)
    assert len(got) == 3


def test_basket_pair_rules_support_and_distinct(spark):
    from vivace_graph_v3_spark.operators.product_analytics import (
        basket_pair_rules)

    li = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 20),      # dup lineitem must not inflate
         (2, 10), (2, 20),
         (3, 10), (3, 30)],
        "l_orderkey long, l_partkey long")
    rows = basket_pair_rules(li, min_support=2, top_k=10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.part_a, r.part_b, r.pair_count) == (10, 20, 2)
    assert (r.count_a, r.count_b) == (3, 2)
    assert r.conf_a_to_b_ppm == 2 * 1_000_000 // 3
    assert r.conf_b_to_a_ppm == 1_000_000


def test_dow_profile_shares(spark):
    from vivace_graph_v3_spark.operators.product_analytics import dow_profile

    # base epoch-day 19723 is a Monday -> dow 1; +1 day -> Tuesday
    ev = _ev(spark, [(1, "a", 0), (2, "a", 0), (3, "a", 24),
                     (1, "b", 24)])
    got = {(r.event_type, r.dow): (r.n_events, r.share_ppm)
           for r in dow_profile(ev).collect()}
    assert got[("a", 1)] == (2, 666_666)
    assert got[("a", 2)] == (1, 333_333)
    assert got[("b", 2)] == (1, 1_000_000)


def test_order_lag_features_windows(spark):
    from vivace_graph_v3_spark.operators.product_analytics import (
        order_lag_features)

    orders = spark.createDataFrame(
        [(101, 1, datetime(2024, 1, 1), 10.0),
         (102, 1, datetime(2024, 1, 4), 20.0),
         (103, 1, datetime(2024, 1, 4), 30.0),    # same day: key-ordered
         (104, 1, datetime(2024, 2, 1), 40.0),
         (201, 2, datetime(2024, 1, 10), 5.0)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_totalprice double")
    got = {r.o_orderkey: (r.order_idx, r.gap_days, r.rolling3_cents)
           for r in order_lag_features(orders).collect()}
    assert got[101] == (1, None, 1000)
    assert got[102] == (2, 3, 3000)
    assert got[103] == (3, 0, 6000)
    assert got[104] == (4, 28, 9000)        # rolling3 drops order 101
    assert got[201] == (1, None, 500)


def test_autocorrelation_hand_series(spark):
    from vivace_graph_v3_spark.operators.product_analytics import (
        NANOS_PER_DAY, autocorrelation)

    # daily counts x = [1, 2, 1, 2] over days 0..3:
    # y = 4x - 6 = [-2, 2, -2, 2]; den = 16
    # lag1 num = -12 -> -750000 ppm; lag2 num = 8 -> 500000 ppm
    rows = []
    for day, n in enumerate([1, 2, 1, 2]):
        rows += [(u, "e", day * NANOS_PER_DAY + u) for u in range(n)]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    got = {r.lag: (r.n_terms, r.acf_ppm)
           for r in autocorrelation(ev, max_lag=2).collect()}
    assert got[1] == (3, -750_000)
    assert got[2] == (2, 500_000)


def test_series_smooth_two_taps(spark):
    from vivace_graph_v3_spark.operators.product_analytics import (
        NANOS_PER_DAY, series_smooth)

    # daily counts [1, 2]: day0 = 1.0; day1 = (2 + 0.5) / 1.5 -> 1666667
    rows = [(0, "e", 0), (0, "e", NANOS_PER_DAY), (1, "e", NANOS_PER_DAY + 1)]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    got = {r.day: r.smooth_ppm for r in series_smooth(ev, taps=2).collect()}
    assert got[0] == 1_000_000
    assert got[1] == 1_666_667


def test_attribution_last_touch_channels(spark):
    from vivace_graph_v3_spark.operators.product_analytics import (
        NANOS_PER_DAY, attribution_last_touch)

    d = NANOS_PER_DAY
    rows = [
        (1, "click", 0 * d, 0.0), (1, "purchase", 1 * d, 10.0),  # click
        (2, "view", 0 * d, 0.0), (2, "purchase", 10 * d, 20.0),  # stale: organic
        (3, "purchase", 5 * d, 30.0),                            # no touch
        (4, "view", 0 * d, 0.0), (4, "click", 1 * d, 0.0),       # latest wins
        (4, "purchase", 2 * d, 40.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts long, value double")
    got = {r.channel: (r.n_conversions, r.revenue_cents)
           for r in attribution_last_touch(ev, window_days=7).collect()}
    assert got["click"] == (2, 5000)
    assert got["(organic)"] == (2, 5000)


def test_item_cf_similarity_hand_cosine(spark):
    from vivace_graph_v3_spark.operators.product_analytics import (
        item_cf_similarity)

    # customers 1,2 both buy parts 10+20; customer 3 buys 10 only:
    # c10=3, c20=2, co=2 -> sim = 2/sqrt(6)
    orders = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "o_orderkey long, o_custkey long")
    li = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10)],
        "l_orderkey long, l_partkey long")
    got = {(r.item, r.neighbor): (r.co, r.sim_ppm, r.rank)
           for r in item_cf_similarity(orders, li, k=5,
                                       min_pair=2).collect()}
    import math
    want = math.floor(2 / math.sqrt(6.0) * 1000000 + 0.5)
    assert got[(10, 20)] == (2, want, 1)
    assert got[(20, 10)] == (2, want, 1)


def test_mad_outliers_hand_case(spark):
    from vivace_graph_v3_spark.operators.product_analytics import (
        mad_outliers)

    # values 1..9 plus an extreme 1000: lower median of 10 values = 5,
    # deviations {0..4, 995} -> MAD = 2 (lower median of
    # {4,3,2,1,0,1,2,3,4,995} sorted: 0,1,1,2,2,3,3,4,4,995 -> 5th = 2);
    # outlier rule |v-5|*10 > 35*2=70 -> |v-5| > 7 -> only 1000
    rows = [("a", float(v)) for v in list(range(1, 10)) + [1000]]
    df = spark.createDataFrame(rows, "event_type string, value double")
    row = mad_outliers(df).first()
    assert (row.n, row.median_cents, row.mad_cents) == (10, 500, 200)
    assert row.n_outliers == 1


def test_attribution_linear_splits_evenly(spark):
    from datetime import datetime

    from vivace_graph_v3_spark.operators.product_analytics import (
        attribution_linear)

    # user u: click, view, view, then a 6.00 purchase -> click gets 1/3,
    # view 2/3; user v: purchase with no touches -> organic
    rows = [
        ("u", datetime(2024, 1, 1, 10), "click", 0.0),
        ("u", datetime(2024, 1, 1, 11), "view", 0.0),
        ("u", datetime(2024, 1, 1, 12), "view", 0.0),
        ("u", datetime(2024, 1, 1, 13), "purchase", 6.0),
        ("v", datetime(2024, 1, 2, 10), "purchase", 9.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_type string, value double")
    out = {r.channel: r for r in attribution_linear(df).collect()}
    assert out["click"].credit_ppm == 333333
    assert out["view"].credit_ppm == 666666
    assert out["click"].revenue_cents == 200
    assert out["view"].revenue_cents == 400
    assert out["(organic)"].credit_ppm == 1000000
    assert out["(organic)"].revenue_cents == 900
    assert "signup" not in out  # zero-credit channels drop out


def test_session_paths_orders_and_ranks(spark):
    from datetime import datetime

    from vivace_graph_v3_spark.operators.product_analytics import (
        session_paths)

    rows = [
        # u day1: view > click > purchase (ts order)
        ("u", datetime(2024, 1, 1, 9), "view"),
        ("u", datetime(2024, 1, 1, 10), "click"),
        ("u", datetime(2024, 1, 1, 11), "purchase"),
        ("u", datetime(2024, 1, 1, 12), "error"),  # beyond depth 3
        # v day1: view > click > purchase too
        ("v", datetime(2024, 1, 1, 9), "view"),
        ("v", datetime(2024, 1, 1, 10), "click"),
        ("v", datetime(2024, 1, 1, 11), "purchase"),
        # w day1: single-event session pads with ''
        ("w", datetime(2024, 1, 1, 9), "signup"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_type string")
    out = session_paths(df, depth=3, top_k=10).collect()
    assert out[0].path == "view>click>purchase"
    assert out[0].n_sessions == 2 and out[0].rank == 1
    assert ("signup>>", 1) in [(r.path, r.n_sessions) for r in out]


def test_centroid_drift_identical_halves(spark):
    from vivace_graph_v3_spark.pipeline.similarity import centroid_drift

    # label 7: even and odd halves identical vectors -> cosine 1.0;
    # label 8: orthogonal halves -> cosine 0.0
    rows = [
        (0, [1.0, 0.0], 7), (1, [1.0, 0.0], 7),
        (2, [0.5, 0.5], 7), (3, [0.5, 0.5], 7),
        (4, [1.0, 0.0], 8), (5, [0.0, 1.0], 8),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    out = {r.label: r.centroid_cosine for r in centroid_drift(df).collect()}
    assert out[7] == 1.0
    assert out[8] == 0.0


def test_interpurchase_gaps_value_grid(spark):
    from datetime import datetime

    from vivace_graph_v3_spark.operators.product_analytics import (
        interpurchase_gaps)

    orders = spark.createDataFrame(
        [(1, "c1", datetime(2024, 1, 1)), (2, "c1", datetime(2024, 1, 11)),
         (3, "c1", datetime(2024, 1, 14)), (4, "c2", datetime(2024, 2, 1)),
         (5, "c2", datetime(2024, 2, 3))],
        "o_orderkey long, o_custkey string, o_orderdate timestamp")
    cust = spark.createDataFrame([("c1", "SEG_A"), ("c2", "SEG_A")],
                                 "c_custkey string, c_mktsegment string")
    r = interpurchase_gaps(orders, cust).first()
    # gaps: c1 -> 10, 3; c2 -> 2; grid {2,3,10}: lower median (n=3) = 3,
    # p90 = 10, max = 10
    assert (r.segment, r.n_gaps) == ("SEG_A", 3)
    assert (r.median_gap_days, r.p90_gap_days, r.max_gap_days) == (3, 10, 10)


def test_ab_experiment_report_counts_and_z(spark):
    import hashlib
    import math

    from vivace_graph_v3_spark.operators.product_analytics import (
        ab_experiment_report)

    def arm(u):
        h = hashlib.md5(str(u).encode()).hexdigest()[:16]
        v = int(h, 16)
        v = v - (1 << 64) if v >= (1 << 63) else v
        return v % 2

    rows = []
    eid = 0
    # 40 users view; user u purchases u%4 times (converter iff >= 2)
    for u in range(40):
        rows.append((eid, u, "view")); eid += 1
        for _ in range(u % 4):
            rows.append((eid, u, "purchase")); eid += 1
    df = spark.createDataFrame(rows, ["event_id", "user_id", "event_type"])
    out = {r["arm"]: r for r in ab_experiment_report(
        df, min_conversions=2).collect()}
    want = {0: {"n": 0, "c": 0}, 1: {"n": 0, "c": 0}}
    for u in range(40):
        a = arm(u)
        want[a]["n"] += 1
        want[a]["c"] += 1 if (u % 4) >= 2 else 0
    for a in (0, 1):
        assert out[a]["n_users"] == want[a]["n"]
        assert out[a]["n_converters"] == want[a]["c"]
        assert out[a]["conv_ppm"] == want[a]["c"] * 1_000_000 // want[a]["n"]
    n0, c0 = want[0]["n"], want[0]["c"]
    n1, c1 = want[1]["n"], want[1]["c"]
    pp = (c0 + c1) / (n0 + n1)
    zz = (c1 / n1 - c0 / n0) / math.sqrt(
        pp * (1 - pp) * (1 / n0 + 1 / n1))
    assert out[0]["z"] == out[1]["z"] == round(zz, 6)


def test_ab_experiment_degenerate_all_convert_z_zero(spark):
    from vivace_graph_v3_spark.operators.product_analytics import (
        ab_experiment_report)
    rows = []
    eid = 0
    for u in range(10):
        rows.append((eid, u, "view")); eid += 1
        rows.append((eid, u, "purchase")); eid += 1
    df = spark.createDataFrame(rows, ["event_id", "user_id", "event_type"])
    out = ab_experiment_report(df).collect()
    assert all(r["z"] == 0.0 for r in out)  # pp=1 -> guarded, not 0/0


def test_ab_experiment_single_arm_still_reports(spark):
    from vivace_graph_v3_spark.operators.product_analytics import (
        ab_experiment_report)
    # one exposed user -> only one arm exists; the report must still
    # emit that arm's row with z = 0.0 (not an empty frame)
    df = spark.createDataFrame(
        [(0, 7, "view"), (1, 7, "purchase")],
        ["event_id", "user_id", "event_type"])
    out = ab_experiment_report(df).collect()
    assert len(out) == 1
    assert out[0]["n_users"] == 1 and out[0]["z"] == 0.0
