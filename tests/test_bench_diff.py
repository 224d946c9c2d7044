"""Bench regression diff (tools/bench_diff.py) — pure-python, no Spark.

Pins the contract bench.py relies on: common-set totals, >1.3x flagging
with the sub-0.3 s noise floor, added/removed listing, and acceptance of
both raw bench payloads and the driver's {"parsed": ...} wrapper.
"""

from tools.bench_diff import DRIFT_RATIO, FLOOR_SEC, diff_table, latest_bench_files


def test_flags_regression_and_improvement():
    old = {"queries": {"a": 1.0, "b": 1.0, "c": 1.0}}
    new = {"queries": {"a": 1.5, "b": 0.5, "c": 1.05}}
    table = diff_table(old, new)
    lines = {ln.split()[0]: ln for ln in table.splitlines()}
    assert "REGRESSION" in lines["a"]
    assert "improved" in lines["b"]
    assert "REGRESSION" not in lines["c"] and "improved" not in lines["c"]
    assert "1 flagged" in table


def test_floor_absorbs_microquery_jitter():
    # 0.1 -> 0.25 is 2.5x but both sides are under FLOOR_SEC: not a flag.
    assert max(0.1, 0.25) < FLOOR_SEC
    table = diff_table({"queries": {"tiny": 0.1}}, {"queries": {"tiny": 0.25}})
    assert "REGRESSION" not in table
    assert "0 flagged" in table


def test_added_removed_and_common_total():
    old = {"queries": {"a": 1.0, "gone": 2.0}}
    new = {"queries": {"a": 1.0, "fresh": 9.0}}
    table = diff_table(old, new)
    assert "added (1): fresh" in table
    assert "removed (1): gone" in table
    # total is over the common set only — the 9 s new query must not count.
    assert "TOTAL (1 common)" in table.replace("  ", " ").replace("  ", " ") or "1 common" in table


def test_driver_wrapper_unwrapped():
    wrapped = {"parsed": {"queries": {"a": 1.0}}}
    raw = {"queries": {"a": 1.2}}
    table = diff_table(wrapped, raw)
    assert "a" in table and "1.200" in table


def test_latest_bench_files(tmp_path):
    for n in (1, 2, 3):
        (tmp_path / f"BENCH_r0{n}.json").write_text(
            '{"queries": {"q": 1.0}}'
        )
    # crashed-round wrapper (parsed: null) and junk must both be skipped
    (tmp_path / "BENCH_r04.json").write_text('{"parsed": null, "rc": 1}')
    (tmp_path / "BENCH_r05.json").write_text("not json")
    got = latest_bench_files(str(tmp_path), n=2)
    assert [p.rsplit("/", 1)[1] for p in got] == ["BENCH_r02.json", "BENCH_r03.json"]


def test_drift_ratio_sane():
    assert 1.0 < DRIFT_RATIO < 2.0
