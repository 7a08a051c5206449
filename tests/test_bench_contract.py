"""Standing gate: bench.py's final stdout JSON line must fit the driver's
stdout-tail window.

Round-4 post-mortem: the driver captures only the last ~2000 characters of
bench.py stdout and parses the LAST line as JSON. Round 4 inlined a per-op
``spread`` map into that line, pushing it past the window; the driver saw a
brace-less truncated line and recorded ``parsed: null`` — the round lost its
bench grade despite rc=0. This test rebuilds the line with worst-case widths
for every op in BENCH_QUERIES (plus the five mvcc write-path keys) and fails
if it could ever exceed a conservative 1900-char budget.
"""

import json

import bench


MVCC_KEYS = [
    "mvcc_insert_20k",
    "mvcc_update_20k",
    "mvcc_delete_10k",
    "mvcc_snapshot",
    "mvcc_replay",
]

# harness-level timing rows that ride the queries map alongside the
# registry entries (never removed, per the driver contract): the mvcc
# write path plus the round-10 core-scaling probe
EXTRA_KEYS = MVCC_KEYS + ["scale_probe"]


def _worst_case_line() -> str:
    # 99.99 is wider than any per-op median ever recorded at sf0.1 (the
    # worst has been ~18 s; an op at 100 s would fail the perf bar long
    # before it threatened the tail window). The suite total keeps a
    # 5-digit worst case of its own.
    timings = {k: 99.99 for k in bench.BENCH_QUERIES + EXTRA_KEYS}
    return bench.final_json_line(99999.99, timings, 0.1, 99.99, 99.99)


def test_final_line_fits_driver_tail_window():
    # budget raised 1900 -> 1950 in round 10 for the cpus echo + the
    # scale_probe row (both ordered by VERDICT r9 item 2); the driver's
    # tail is ~2000 chars and the worst case here assumes EVERY op at
    # 99.99 s — the real line has ~400 chars of slack on top of this.
    line = _worst_case_line()
    assert len(line) < 1950, (
        f"bench final JSON line worst-case {len(line)} chars >= 1950; "
        "the driver's stdout tail is ~2000 chars — trim BENCH_QUERIES or "
        "shorten the encoding before adding more ops"
    )


def test_final_line_is_parseable_single_line():
    line = _worst_case_line()
    assert "\n" not in line
    obj = json.loads(line)
    assert obj["metric"] == "headline_suite_seconds"
    assert obj["unit"] == "sec"
    assert set(obj["queries"]) == set(bench.BENCH_QUERIES + EXTRA_KEYS)
    assert obj["sf"] == 0.1
    # the load-drift calibration marker (VERDICT r6 item 2) rides along
    assert obj["cal"] == [99.99, 99.99]
    # the core-count echo (VERDICT r9 item 2): the driver's scaling
    # check reads the count the session actually ran with
    assert obj["cpus"] == bench.CPUS


def test_cal_drift_annotation():
    # >2x disagreement between the bracketing calibrations marks the
    # window dirty; agreement within 2x leaves the line unannotated
    dirty = json.loads(bench.final_json_line(1.0, {}, 0.1, 0.9, 0.2))
    assert dirty["drift"] == 1
    clean = json.loads(bench.final_json_line(1.0, {}, 0.1, 0.3, 0.2))
    assert "drift" not in clean
    # worst-case line stays under the tail window with the annotation
    timings = {k: 99.99 for k in bench.BENCH_QUERIES + EXTRA_KEYS}
    line = bench.final_json_line(99999.99, timings, 0.1, 99.99, 1.0)
    assert json.loads(line)["drift"] == 1
    assert len(line) < 1950


def test_suite_total_excludes_scale_probe():
    """The headline total must sum the SAME entries every prior round
    summed — scale_probe is an additive diagnostic row, not suite work."""
    import statistics as st  # noqa: F401  (parity with bench's import)
    timings = {k: 1.0 for k in bench.BENCH_QUERIES + EXTRA_KEYS}
    expected = float(len(bench.BENCH_QUERIES) + len(MVCC_KEYS))
    # replicate bench's total expression
    total = round(sum(v for k, v in timings.items() if k != "scale_probe"), 3)
    assert total == expected
