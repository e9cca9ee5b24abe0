"""bench.py regression gate: must compare LIKE-FOR-LIKE (same platform and
verified-ness), search backwards through records rather than silently
skipping, and FIRE on a synthetic 0.5x regression in both modes
(round-2 verdict weakness #6 / next-round item #8)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _write(dirpath, name, value, verified, platform="tpu", mtime=None):
    p = os.path.join(dirpath, name)
    with open(p, "w") as f:
        json.dump({"parsed": {
            "metric": f"complex Msamples/s/chip, chain ({platform}"
                      + ("" if verified else ", dispatch-rate UNVERIFIED")
                      + ")",
            "value": value, "unit": "Msps", "verified": verified}}, f)
    if mtime is not None:
        os.utime(p, (mtime, mtime))
    return p


@pytest.fixture
def records(tmp_path, monkeypatch):
    monkeypatch.setenv("GR4_BENCH_RECORD_DIR", str(tmp_path))
    return str(tmp_path)


def _gate_rc(msps, platform, verified, monkeypatch):
    monkeypatch.setenv("GR4_BENCH_GATE", "1")
    try:
        bench._regression_gate(msps, platform, verified)
    except SystemExit as e:
        return e.code
    return 0


class TestRegressionGate:
    def test_fires_on_verified_regression(self, records, monkeypatch):
        _write(records, "BENCH_r01.json", 1000.0, True, mtime=1000)
        assert _gate_rc(500.0, "tpu", True, monkeypatch) == 3

    def test_fires_on_dispatch_rate_regression(self, records, monkeypatch):
        _write(records, "BENCH_r01.json", 100000.0, False, mtime=1000)
        assert _gate_rc(50000.0, "tpu", False, monkeypatch) == 3

    def test_passes_at_parity(self, records, monkeypatch):
        _write(records, "BENCH_r01.json", 1000.0, True, mtime=1000)
        assert _gate_rc(990.0, "tpu", True, monkeypatch) == 0

    def test_searches_past_mismatched_mode(self, records, monkeypatch):
        # newest record is dispatch-rate; an older verified record exists —
        # the gate must find it instead of skipping (the round-2 hole)
        _write(records, "BENCH_r01.json", 1000.0, True, mtime=1000)
        _write(records, "BENCH_r02.json", 100000.0, False, mtime=2000)
        assert _gate_rc(400.0, "tpu", True, monkeypatch) == 3
        assert _gate_rc(950.0, "tpu", True, monkeypatch) == 0

    def test_dispatch_run_gated_against_dispatch_record(self, records,
                                                        monkeypatch):
        _write(records, "BENCH_r01.json", 100000.0, False, mtime=1000)
        _write(records, "VERIFIED_BENCH_r03.json", 1000.0, True, mtime=2000)
        # dispatch-rate run: compared against r01 (dispatch), not the newer
        # verified record — 60k vs 100k fires
        assert _gate_rc(60000.0, "tpu", False, monkeypatch) == 3
        assert _gate_rc(90000.0, "tpu", False, monkeypatch) == 0

    def test_platform_mismatch_never_gates(self, records, monkeypatch):
        _write(records, "BENCH_r01.json", 1000.0, True, platform="tpu",
               mtime=1000)
        assert _gate_rc(1.0, "cpu", True, monkeypatch) == 0

    def test_no_records_is_explicit_not_silent(self, records, monkeypatch,
                                               capsys):
        assert _gate_rc(123.0, "tpu", True, monkeypatch) == 0
        err = capsys.readouterr().err
        assert "no prior tpu/verified record" in err
