"""Unit tests for the bench.py measurement helpers (CPU)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import median_of  # noqa: E402


def test_median_of_odd():
    vals = iter([3.0, 1.0, 2.0, 5.0, 4.0])
    med, spread = median_of(lambda: next(vals), 5)
    assert med == 3.0
    assert abs(spread - 4.0 / 3.0) < 1e-12


def test_median_of_even():
    vals = iter([4.0, 2.0])
    med, spread = median_of(lambda: next(vals), 2)
    assert med == 3.0
    assert abs(spread - 2.0 / 3.0) < 1e-12


def test_median_of_constant_zero():
    med, spread = median_of(lambda: 0.0, 3)
    assert med == 0.0 and spread == 0.0


import pytest  # noqa: E402


class TestScoreboardContract:
    """Round-4 hardening (VERDICT r03 item 1): the scoreboard is
    unkillable — stdout is ALWAYS one valid JSON line and the rc
    distinguishes ok / regression / no-chip."""

    @pytest.fixture(autouse=True)
    def _redirect_full_scoreboard(self, monkeypatch, tmp_path):
        """Never clobber the round's committed live-chip artifact
        (docs/bench_r05_full.json) from the CPU test suite."""
        monkeypatch.setenv("MC_TPU_BENCH_FULL_OUT",
                           str(tmp_path / "bench_full.json"))

    def test_no_chip_emits_json_and_rc2(self, monkeypatch, capsys):
        import bench
        from mc_tpu.utils import platform as plat
        monkeypatch.setattr(
            plat, "probe_backend",
            lambda **kw: {"ok": False, "backend": None, "device": None,
                          "error": "probe timed out", "attempts": 3})
        rc = bench.main([])
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 1
        import json
        doc = json.loads(out[0])
        assert doc["error"] == "tpu-unavailable"
        assert doc["value"] == 0.0
        assert doc["extra"]["accuracy_ok_3se"] is True  # CPU gate ran
        assert rc == 2

    def test_cpu_pinned_is_rc0(self, monkeypatch, capsys):
        import json

        import bench
        rc = bench.main(["--platform", "cpu"])
        doc = json.loads(capsys.readouterr().out.strip())
        assert doc["error"] == "cpu-pinned"
        assert doc["extra"]["accuracy_ok_3se"] is True
        assert rc == 0

    def test_nothing_measured_is_rc1_even_if_accurate(self, monkeypatch,
                                                      capsys):
        """A green accuracy gate does not excuse an empty scoreboard."""
        import json

        import bench

        def boom(*a, **kw):
            raise RuntimeError("row died")

        for row in ("terminal_pair_seconds", "kernel_seconds",
                    "heston_kernel_seconds", "merton_kernel_seconds",
                    "bates_kernel_seconds", "roofline_primitives",
                    "sabr_kernel_seconds", "vasicek_kernel_seconds",
                    "rainbow_kernel_seconds", "fx_kernel_seconds",
                    "localvol_kernel_seconds",
                    "qmc_kernel_seconds", "hw_swaption_kernel_seconds",
                    "g2_swaption_kernel_seconds",
                    "hw_swaption_fused_kernel_seconds",
                    "g2_swaption_fused_kernel_seconds",
                    "va_swaption_fused_kernel_seconds",
                    "nmc_demo_seconds", "book_kernel_seconds",
                    "roofline", "billion_path_run"):
            monkeypatch.setattr(bench, row, boom)
        monkeypatch.setattr(
            bench, "accuracy_gate",
            lambda engine="pallas": {"accuracy_ok_3se": True,
                                     "price": 0.0,
                                     "black_scholes": 0.0,
                                     "abs_err_in_stderr": 0.0})
        rc = bench._full_bench()
        doc = json.loads(capsys.readouterr().out.strip())
        assert doc["value"] == 0.0
        assert doc["extra"]["headline_fallback"] == "none-measured"
        # The slim stdout line carries the error COUNT (the full map
        # lives in the full-scoreboard file, round-5 slim contract).
        assert doc["extra"]["row_error_count"] > 0
        assert rc == 1
