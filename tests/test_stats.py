"""Unit tests for operators/stats.py (chi-square independence, Benford
first-digit audit, Theil–Sen trend) and the rolling-distinct-users
operator — hand-computable fixtures plus pure-Python differentials."""

import math

from pyspark.sql import functions as F

from vivace_graph_v3_spark.operators.stats import (
    BENFORD_PPM, benford_first_digit, chi2_independence, theilsen_trend)
from vivace_graph_v3_spark.operators.product_analytics import (
    rolling_distinct_users)


def _ppm(num: int, den: int) -> int:
    return (num * 2000000 + den) // (den * 2)


class TestChi2:
    def test_hand_grid(self, spark):
        # 2x2: a=(x: 30 y: 10), b=(x: 10 y: 30); n=80
        rows = ([("a", "x")] * 30 + [("a", "y")] * 10
                + [("b", "x")] * 10 + [("b", "y")] * 30)
        df = spark.createDataFrame(rows, ["g", "h"])
        out = {(r["g"], r["h"]): r
               for r in chi2_independence(df, "g", "h").collect()}
        assert len(out) == 4
        # expected for every cell: 40*40/80 = 20 -> 20_000_000 ppm
        # contrib per cell: (30-20)^2/20 = 5 -> 5_000_000 ppm
        for cell in out.values():
            assert cell["expected_ppm"] == 20_000_000
            assert cell["contrib_ppm"] == 5_000_000
            assert cell["chi2_total_ppm"] == 20_000_000
            assert cell["dof"] == 1
            # V = sqrt(20 / (80 * 1)) = 0.5
            assert abs(cell["cramers_v"] - 0.5) < 1e-12

    def test_independent_columns_zero_chi2(self, spark):
        # perfectly independent 2x2 -> chi2 == 0
        rows = [("a", "x")] * 6 + [("a", "y")] * 6 \
            + [("b", "x")] * 3 + [("b", "y")] * 3
        df = spark.createDataFrame(rows, ["g", "h"])
        out = chi2_independence(df, "g", "h").collect()
        assert all(r["contrib_ppm"] == 0 for r in out)
        assert all(r["cramers_v"] == 0.0 for r in out)

    def test_python_differential(self, spark):
        # pseudo-random deterministic contingency data vs pure Python
        rows = [(f"a{i % 3}", f"b{(i * 7 + i * i) % 4}")
                for i in range(500)]
        df = spark.createDataFrame(rows, ["g", "h"])
        got = {(r["g"], r["h"]): r["contrib_ppm"]
               for r in chi2_independence(df, "g", "h").collect()}
        from collections import Counter
        cells = Counter(rows)
        ra = Counter(a for a, _ in rows)
        cb = Counter(b for _, b in rows)
        n = len(rows)
        for (a, b), o in cells.items():
            diff = o * n - ra[a] * cb[b]
            den = ra[a] * cb[b] * n
            assert got[(a, b)] == _ppm(diff * diff, den)


class TestBenford:
    def test_digit_extraction_and_shares(self, spark):
        # values whose cent-strings start with known digits
        vals = [1.23, 19.99, 2.50, 31.41, 0.47, 900.0, 0.05]
        # cents: 123, 1999, 250, 3141, 47, 90000, 5 -> digits 1,1,2,3,4,9,5
        df = spark.createDataFrame([(v,) for v in vals], ["amt"])
        out = {r["digit"]: r for r in
               benford_first_digit(df, "amt").collect()}
        assert {d: r["n"] for d, r in out.items()} == {
            1: 2, 2: 1, 3: 1, 4: 1, 5: 1, 9: 1}
        assert out[1]["observed_ppm"] == _ppm(2, 7)
        assert out[1]["benford_ppm"] == 301030
        assert out[9]["abs_dev_ppm"] == abs(_ppm(1, 7) - 45757)

    def test_nonpositive_filtered(self, spark):
        df = spark.createDataFrame(
            [(0.0,), (-5.0,), (3.0,)], ["amt"])
        out = benford_first_digit(df, "amt").collect()
        assert len(out) == 1 and out[0]["digit"] == 3 and out[0]["n"] == 1

    def test_constants_match_log10(self):
        for d, ppm in BENFORD_PPM.items():
            assert ppm == round(math.log10(1 + 1 / d) * 1e6)


class TestTheilSen:
    def test_exact_line_recovers_slope(self, spark):
        pts = [("g", x, 5 * x + 100) for x in range(10)]
        df = spark.createDataFrame(pts, ["g", "x", "y"])
        out = theilsen_trend(df, "g", "x", "y").collect()
        assert len(out) == 1
        r = out[0]
        assert r["n_points"] == 10 and r["n_pairs"] == 45
        assert r["slope"] == 5.0

    def test_outlier_resistant_vs_python(self, spark):
        # one wild outlier must not move the median slope far
        ys = [3 * x + 7 for x in range(9)] + [100000]
        pts = [("g", x, y) for x, y in enumerate(ys)]
        df = spark.createDataFrame(pts, ["g", "x", "y"])
        got = theilsen_trend(df, "g", "x", "y").collect()[0]
        slopes = sorted(
            (y2 - y1) / (x2 - x1)
            for x1, y1 in enumerate(ys) for x2, y2 in enumerate(ys)
            if x2 > x1)
        # lower median: smallest element with cum*2 >= n
        lower_median = slopes[(len(slopes) - 1) // 2]
        assert got["slope"] == lower_median
        assert abs(got["slope"] - 3.0) < 1.0

    def test_groups_isolated(self, spark):
        pts = [("a", x, 2 * x) for x in range(5)] \
            + [("b", x, -4 * x) for x in range(5)]
        df = spark.createDataFrame(pts, ["g", "x", "y"])
        out = {r["g"]: r["slope"]
               for r in theilsen_trend(df, "g", "x", "y").collect()}
        assert out == {"a": 2.0, "b": -4.0}


class TestRollingDistinct:
    def test_hand_window(self, spark):
        ns_day = 86_400_000_000_000
        # user 1 on days 0 and 10; user 2 on day 3
        rows = [(1, 0 * ns_day), (1, 10 * ns_day), (2, 3 * ns_day),
                (1, 0 * ns_day + 5)]  # same-day duplicate must not count
        df = spark.createDataFrame(rows, ["user_id", "ts"])
        out = {r["epoch_day"]: r["n_users"]
               for r in rolling_distinct_users(df, window_days=7).collect()}
        # reported days = days present in data: 0, 3, 10
        assert set(out) == {0, 3, 10}
        assert out[0] == 1          # only user 1 in [-6, 0]
        assert out[3] == 2          # users 1 (day 0) and 2 (day 3)
        assert out[10] == 1         # user 1's day-10 event; day 3 aged out
    def test_window_one_equals_dau(self, spark):
        ns_day = 86_400_000_000_000
        rows = [(u, d * ns_day) for u in (1, 2, 3) for d in (0, 1)] \
            + [(4, 1 * ns_day)]
        df = spark.createDataFrame(rows, ["user_id", "ts"])
        out = {r["epoch_day"]: r["n_users"]
               for r in rolling_distinct_users(df, window_days=1).collect()}
        assert out == {0: 3, 1: 4}


class TestBoxplot:
    def test_hand_five_number(self, spark):
        from vivace_graph_v3_spark.operators.profile import boxplot_stats

        # 1..8 plus one far outlier 100
        rows = [("g", v) for v in list(range(1, 9)) + [100]]
        df = spark.createDataFrame(rows, ["grp", "val"])
        r = boxplot_stats(df, "grp", "val").collect()[0]
        # n=9: q1 = min x with cum*4 >= 9  -> x=3 (cum 3*4=12)
        # median cum*2 >= 9 -> x=5; q3 cum*4 >= 27 -> x=7
        assert (r["n_rows"], r["min_x"], r["max_x"]) == (9, 1, 100)
        assert (r["q1"], r["median"], r["q3"], r["iqr"]) == (3, 5, 7, 4)
        # fences: [3 - 6, 7 + 6] = [-3, 13] -> only 100 falls outside
        assert r["n_outliers"] == 1

    def test_constant_group_zero_iqr(self, spark):
        from vivace_graph_v3_spark.operators.profile import boxplot_stats

        df = spark.createDataFrame([("g", 5)] * 4, ["grp", "val"])
        r = boxplot_stats(df, "grp", "val").collect()[0]
        assert r["iqr"] == 0 and r["n_outliers"] == 0
        assert r["q1"] == r["median"] == r["q3"] == 5
