"""Bandwidth model tests (C13) — mirrors ``tests/test_bandwidth.cu``."""

from tpu_spmv import (
    compute_bandwidth_csr,
    compute_bandwidth_ell,
    get_tpu_peak_bandwidth,
)

from conftest import PROP_ITERS


class TestProperty12MetricValidity:
    """Property 12: metrics are finite, non-negative, efficiency in [0,1]
    (test_bandwidth.cu:19-57)."""

    def test_csr_metrics(self, rng):
        for _ in range(PROP_ITERS):
            rows = rng.uniform_int(1, 10000)
            cols = rng.uniform_int(1, 10000)
            nnz = rng.uniform_int(0, rows * 4)
            ms = rng.uniform(0.001, 100.0)
            m = compute_bandwidth_csr(rows, cols, nnz, ms)
            assert m.theoretical_gb_s > 0
            assert m.achieved_gb_s >= 0
            assert 0.0 <= m.efficiency <= 1.0

    def test_ell_metrics(self, rng):
        for _ in range(PROP_ITERS):
            rows = rng.uniform_int(1, 10000)
            cols = rng.uniform_int(1, 10000)
            max_nnz = rng.uniform_int(0, 64)
            ms = rng.uniform(0.001, 100.0)
            m = compute_bandwidth_ell(rows, cols, max_nnz, ms)
            assert m.achieved_gb_s >= 0
            assert 0.0 <= m.efficiency <= 1.0


class TestPeak:
    def test_peak_sane(self):
        """Peak below 10 TB/s (test_bandwidth.cu:60-64)."""
        peak = get_tpu_peak_bandwidth()
        assert 0 < peak < 10000

    def test_env_override(self, monkeypatch):
        monkeypatch.setenv("TPU_SPMV_PEAK_GBS", "1234.5")
        assert get_tpu_peak_bandwidth() == 1234.5


class TestZeroTimeGuard:
    def test_zero_time(self):
        """Zero elapsed time → zero achieved, no division blow-up
        (test_bandwidth.cu:100-113)."""
        m = compute_bandwidth_csr(100, 100, 500, 0.0)
        assert m.achieved_gb_s == 0.0
        assert m.efficiency == 0.0

    def test_byte_model(self):
        """Exact reference byte accounting (bandwidth.cpp:34-42)."""
        rows, cols, nnz, ms = 100, 200, 500, 1.0
        m = compute_bandwidth_csr(rows, cols, nnz, ms)
        expected_bytes = nnz * 8 + (rows + 1) * 4 + cols * 4 + rows * 4
        assert abs(m.achieved_gb_s - expected_bytes / 1e-3 / 1e9) < 1e-9
