"""Pin the bench JSON contract (VERDICT r6 #8).

BENCH_r05.json recorded ``parsed: null`` because bench.py's output drifted
out of the driver's parse window — a whole round of performance comparison
lost. These tests freeze the emitted schema (bench.build_payload) and the
consumer (tools.bench_diff) so the round-over-round diff can never silently
break again: bench.py may only change its JSON line by widening this test
first.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402
from tools.bench_diff import (  # noqa: E402
    calib_factor,
    diff_table,
    latest_bench_files,
    _payload,
)

FAKE_TIMINGS = {"tpch_q1": 0.42, "minhash_lsh_pairs": 1.3}
FAKE_HTAP = {"write_degradation_pct": 6.0, "query_degradation_pct": 1.2}
FAKE_SUSTAINED = {"query_degradation_pct": 40.0, "ingest_rows_per_sec": 5000}


class TestEmittedSchema:
    def test_required_keys_and_types(self):
        doc = bench.build_payload(FAKE_TIMINGS, 0.1, FAKE_HTAP, FAKE_SUSTAINED)
        # The driver's contract: ONE json line with exactly these keys.
        assert set(doc) == {
            "metric",
            "value",
            "unit",
            "queries",
            "sf",
            "calib",
            "calp",
            "htap_mixed",
            "htap_sustained",
            "concurrent_qps",
        }
        assert doc["metric"] == "total_query_wall"
        assert doc["unit"] == "sec"
        assert isinstance(doc["value"], float)
        assert doc["value"] == round(sum(FAKE_TIMINGS.values()), 3)
        assert doc["sf"] == 0.1
        # per-query timings are a flat {str: number} map — what bench_diff
        # and the judge's round-over-round comparison key on
        assert doc["queries"] == FAKE_TIMINGS
        for name, sec in doc["queries"].items():
            assert isinstance(name, str) and isinstance(sec, (int, float))

    def test_json_serializable_single_line(self):
        doc = bench.build_payload(FAKE_TIMINGS, 0.1, FAKE_HTAP, FAKE_SUSTAINED)
        line = json.dumps(doc)
        assert "\n" not in line
        assert json.loads(line) == doc

    def test_serialized_line_fits_driver_tail_window(self):
        """VERDICT r7 #1: the driver captures the LAST 2000 chars of bench
        output; r7's JSON line outgrew that window and the round's bench
        record was lost (BENCH_r07.json parsed=null). Pin the size with a
        worst-case-representative payload: every real headline query at a
        5-char timing (e.g. 12.34), plus htap blocks shaped exactly like
        bench_htap_mixed / bench_htap_sustained returns with wide values.
        Margin: <= 1900 leaves 100 chars for value-width jitter and the
        trailing newline (every representative timing is already worst-case
        5-char width, so jitter is bounded by ~1 char per query)."""
        # r16: the sp_cpu/sp_shuffle scaling probes ride in `queries` too;
        # their chars are paid for by base_rows/writes moving to stderr
        timings = {name: 12.34 for name in bench.HEADLINE + bench.SCALE_PROBES}
        htap = {
            "q_idle_ms": 114.98,
            "q_mix_ms": 224.19,
            "w_pct": 106.7,
            # r14 min-of-3 form: the 3 raw idle/mixed pair medians ride
            # along as flat MICROSECOND ints (4-char widths = 10 ms writes,
            # already ~150x the sub-0.1 ms §7.4 write base)
            "wp": [9999, 9999, 9999, 9999, 9999, 9999],
            "scan_ms": 114.98,
            "q_pct_vs_scan": 162.4,
            "pl_cold_ms": 15.24,
            "pl_warm_ms": 0.047,
        }
        # max_overlay/err dropped from the line r15 (stderr note /
        # omitted-when-None) — their chars pay for calp
        sustained = {
            "ingested": 68000,
            "rows_per_s": 14723,
            "flushes": 12,
            "q_idle_ms": 115.09,
            "q_sus_ms": 146.37,
            "q_p95_ms": 181.73,
            "scan_ms": 115.09,
            "q_pct_vs_scan": 114.1,
            "n_q": 12,
            "upd_q_ms": 1234.56,
        }
        # bench.main() serializes with compact separators — measure the
        # same form it prints (calib carries two 6-char floats; calp the
        # r15 positional probe-trio sums at worst-case width)
        calib = {"jvm": 12.345, "scan": 12.345, "jvms": 12.345}
        calp = [9999, 9999, 9999]  # centisecond ints, worst-case 4-digit
        concurrent = {
            "pl": 123456,
            "plm": 123456,
            "scan": 1234,
            "fscan": 1234,
        }
        line = json.dumps(
            bench.build_payload(
                timings, 0.1, htap, sustained, calib, concurrent, calp
            ),
            separators=(",", ":"),
        )
        assert len(line) <= 1900, (
            f"bench JSON line is {len(line)} chars — would overflow the "
            "driver's 2000-char tail window; shrink the payload"
        )
        # and the blocks above must stay in lockstep with the real
        # producers: a key added to bench_htap_* without widening this
        # payload would un-pin the size guarantee
        import inspect

        src_mixed = inspect.getsource(bench.bench_htap_mixed)
        src_sus = inspect.getsource(bench.bench_htap_sustained)
        src_conc = inspect.getsource(bench.bench_concurrent_qps)
        for key in htap:
            assert f'"{key}"' in src_mixed, f"htap_mixed key {key} drifted"
        for key in sustained:
            assert f'"{key}"' in src_sus, f"htap_sustained key {key} drifted"
        for key in concurrent:
            assert f'"{key}"' in src_conc, f"concurrent_qps key {key} drifted"
        assert '"note"' not in src_mixed and '"note"' not in src_sus, (
            "prose notes belong on stderr, not in the JSON line"
        )

    def test_headline_queries_are_registered(self):
        """Every headline name bench.py times must exist in queries() —
        a rename that misses bench.py would crash the driver's bench run
        and cost the round's BENCH file (the exact r5 failure class)."""
        import __spark_entry__ as entrymod

        registered = set(entrymod.queries())
        missing = [n for n in bench.HEADLINE if n not in registered]
        assert not missing, f"bench headline not in queries(): {missing}"
        assert len(bench.HEADLINE) == len(set(bench.HEADLINE)), "duplicate headline"
        for anchor in ("tpch_q1", "minhash_lsh_pairs", "point_lookup"):
            assert anchor in bench.HEADLINE


class TestDiffConsumesPayload:
    def test_diff_accepts_raw_and_wrapped(self):
        old = bench.build_payload({"q": 1.0}, 0.1, {}, {})
        new = bench.build_payload({"q": 1.5}, 0.1, {}, {})
        raw = diff_table(old, new)
        wrapped = diff_table({"parsed": old}, {"parsed": new})
        assert raw == wrapped
        assert "REGRESSION" in raw and "q" in raw

    def test_null_parsed_payload_is_empty_not_error(self):
        # a crashed round's wrapper must not break the next round's diff
        assert _payload({"parsed": None}) == {}
        table = diff_table({"parsed": None}, bench.build_payload({"q": 1.0}, 0.1, {}, {}))
        assert "added (1): q" in table

    def test_latest_bench_files_skips_crashed_rounds(self, tmp_path):
        good = bench.build_payload({"q": 2.0}, 0.1, {}, {})
        (tmp_path / "BENCH_r01.json").write_text(json.dumps({"parsed": good}))
        (tmp_path / "BENCH_r02.json").write_text(json.dumps({"parsed": None}))
        (tmp_path / "BENCH_r03.json").write_text(json.dumps(good))
        picked = latest_bench_files(str(tmp_path), n=2)
        assert [Path(p).name for p in picked] == ["BENCH_r01.json", "BENCH_r03.json"]

    def test_calibration_normalizes_uniform_slowdown(self):
        """VERDICT r8 #1: a uniformly 2x-slower sandbox must NOT flag any
        query when the calibration probes slowed by the same 2x — and a
        genuine 2x plan regression on a steady machine must still flag."""
        old = bench.build_payload(
            {"q_fast": 1.0, "q_slow": 4.0}, 0.1, {}, {},
            calib={"jvm": 1.0, "scan": 1.0},
        )
        # box 2x slower, plans unchanged: every query AND the probes double
        loaded = bench.build_payload(
            {"q_fast": 2.0, "q_slow": 8.0}, 0.1, {}, {},
            calib={"jvm": 2.0, "scan": 2.0},
        )
        assert calib_factor(old, loaded) == 2.0
        table = diff_table(old, loaded)
        assert "REGRESSION" not in table
        assert "0 flagged" in table and "(normalized)" in table
        # same machine speed, one plan genuinely 2x slower: flag survives
        regressed = bench.build_payload(
            {"q_fast": 1.0, "q_slow": 8.0}, 0.1, {}, {},
            calib={"jvm": 1.0, "scan": 1.0},
        )
        table2 = diff_table(old, regressed)
        assert "REGRESSION" in table2 and "1 flagged" in table2

    def test_calibration_absent_falls_back_to_raw(self):
        """Pre-r9 records carry no calib block — the diff must keep working
        on raw ratios (empty calib == missing calib)."""
        old = bench.build_payload({"q": 1.0}, 0.1, {}, {})
        new = bench.build_payload({"q": 1.5}, 0.1, {}, {}, calib={"jvm": 1.0, "scan": 1.0})
        assert calib_factor(old, new) is None
        table = diff_table(old, new)
        assert "REGRESSION" in table and "norm" not in table.splitlines()[0]

    def test_calibration_requires_both_probes_in_both_payloads(self):
        """ADVICE r9: a payload missing one probe (or carrying a 0.0) must
        disable normalization entirely, not silently compare jvm+scan
        against scan alone."""
        full = bench.build_payload(
            {"q": 1.0}, 0.1, {}, {}, calib={"jvm": 1.0, "scan": 1.0}
        )
        for bad_calib in (
            {"jvm": 1.0},                  # scan missing
            {"jvm": 1.0, "scan": 0.0},     # scan rounded to zero
            {"scan": 1.0},                 # jvm missing
            {"jvm": None, "scan": 1.0},    # jvm null
        ):
            bad = bench.build_payload({"q": 1.0}, 0.1, {}, {}, calib=bad_calib)
            assert calib_factor(full, bad) is None, bad_calib
            assert calib_factor(bad, full) is None, bad_calib

    def test_repo_bench_history_still_parses(self):
        """The real recorded rounds keep satisfying the contract — if the
        driver's wrapper format shifts, this is the first alarm."""
        files = latest_bench_files(str(REPO), n=2)
        assert files, "no usable BENCH_r*.json in repo root"
        docs = []
        for p in files:
            with open(p) as fh:
                docs.append(json.load(fh))
        if len(docs) == 2:
            table = diff_table(docs[0], docs[1])
            assert "TOTAL" in table


class TestPositionalCalibration:
    """r15: interleaved probe samples (calp) join the payload. When both
    rounds carry them, the factor uses per-key MEDIANS across positions;
    otherwise it falls back to the min-based calib block unchanged."""

    def test_calp_median_preferred_over_calib_min(self):
        # old quiet throughout; new quiet at start but loaded mid/end —
        # the min-based factor would read 1.0 (undercorrecting), the
        # median reads the mid-run load
        old = {
            "queries": {},
            "calib": {"jvm": 1.0, "scan": 1.0, "jvms": 1.0},
            "calp": [3.0, 3.0, 3.0],
        }
        new = {
            "queries": {},
            "calib": {"jvm": 1.0, "scan": 1.0, "jvms": 1.0},  # min still 1.0
            "calp": [3.0, 6.0, 6.0],
        }
        assert calib_factor(old, new) == 2.0

    def test_calp_missing_on_either_side_falls_back(self):
        with_calp = {
            "queries": {},
            "calib": {"jvm": 1.0, "scan": 1.0, "jvms": 1.0},
            "calp": [3.0, 6.0, 9.0],
        }
        pre_r15 = {
            "queries": {},
            "calib": {"jvm": 2.0, "scan": 2.0, "jvms": 2.0},
        }
        # falls back to the calib sums: (2+2+2)/(1+1+1)
        assert calib_factor(with_calp, pre_r15) == 2.0

    def test_incomplete_calp_block_falls_back(self):
        ok = {
            "queries": {},
            "calib": {"jvm": 1.0, "scan": 1.0, "jvms": 1.0},
            "calp": [3.0, 3.0, 3.0],
        }
        bad = {
            "queries": {},
            "calib": {"jvm": 3.0, "scan": 3.0, "jvms": 3.0},
            "calp": [3.0, 0.0, 3.0],  # a zero sample poisons the list
        }
        # bad calp -> calib fallback: 3.0
        assert calib_factor(ok, bad) == 3.0


class TestSustainedCalibration:
    """r12: the jvms sustained probe joins the calibration set. The
    factor must use all three probes when both payloads carry them,
    and fall back to the two-probe set against pre-r12 records —
    never a mismatched sum."""

    def test_three_probe_set_preferred(self):
        old = {"queries": {}, "calib": {"jvm": 0.1, "scan": 0.05, "jvms": 3.0}}
        new = {"queries": {}, "calib": {"jvm": 0.1, "scan": 0.05, "jvms": 6.0}}
        # jvms dominates: (0.15 + 6.0) / (0.15 + 3.0)
        assert abs(calib_factor(old, new) - (6.15 / 3.15)) < 1e-9

    def test_fallback_against_pre_r12_record(self):
        old = {"queries": {}, "calib": {"jvm": 1.0, "scan": 1.0}}
        new = {"queries": {}, "calib": {"jvm": 2.0, "scan": 2.0, "jvms": 3.0}}
        # old lacks jvms -> two-probe comparison, jvms ignored on new
        assert calib_factor(old, new) == 2.0

    def test_no_common_set_returns_none(self):
        old = {"queries": {}, "calib": {"jvms": 3.0}}
        new = {"queries": {}, "calib": {"jvm": 1.0, "scan": 1.0, "jvms": 3.0}}
        assert calib_factor(old, new) is None
