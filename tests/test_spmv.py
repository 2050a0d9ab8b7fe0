"""SpMV kernel tests (C5, C7-C12) — mirrors ``tests/test_spmv.cu``.

Property 8 is run across ALL kernel variants (the reference only exercised
SCALAR_CSR explicitly, test_spmv.cu:63-65 — SURVEY §4 flags this gap)."""

import numpy as np
import pytest

from tpu_spmv import (
    KernelType,
    SpMVConfig,
    SpMVError,
    csr_from_dense,
    ell_from_dense,
    spmv_cpu_csr,
    spmv_cpu_ell,
    spmv_csr,
    spmv_ell,
    spmv_validate_dimensions,
)
from tpu_spmv.utils.testing import spmv_matches, spmv_rel_equal

from conftest import DEVICE_PROP_ITERS

ALL_CSR_KERNELS = [KernelType.SCALAR_CSR, KernelType.VECTOR_CSR,
                   KernelType.MERGE_PATH]


class TestCPUReference:
    def test_known_example(self):
        """The README 3x3 example (README.md:67-102)."""
        dense = np.array([[1, 0, 2], [0, 3, 0], [4, 0, 5]], np.float32)
        csr = csr_from_dense(dense)
        x = np.array([1.0, 2.0, 3.0], np.float32)
        y = spmv_cpu_csr(csr, x)
        np.testing.assert_allclose(y, [7.0, 6.0, 19.0])

    def test_cpu_ell_matches_csr(self, rng):
        for _ in range(20):
            dense = rng.dense_matrix(rng.uniform_int(1, 30),
                                     rng.uniform_int(1, 30), 0.3)
            csr = csr_from_dense(dense)
            ell = ell_from_dense(dense)
            x = rng.vector(csr.num_cols)
            assert spmv_rel_equal(spmv_cpu_ell(ell, x), spmv_cpu_csr(csr, x))


class TestProperty8DeviceVsCPU:
    """Property 8: device SpMV matches CPU reference at 1e-6 rel
    (test_spmv.cu:40-78), for every kernel variant."""

    @pytest.mark.parametrize("kernel_type", ALL_CSR_KERNELS)
    def test_csr_kernels(self, rng, kernel_type):
        for it in range(DEVICE_PROP_ITERS):
            if it % 5 == 4:
                # cross the superblock/window/block boundaries
                # (rows > 2048, cols > 1024) that small dims never touch
                rows = rng.uniform_int(2049, 5000)
                cols = rng.uniform_int(1025, 3000)
                csr = rng.power_law_csr(rows, cols, avg_nnz=4.0)
            else:
                rows = rng.uniform_int(1, 80)
                cols = rng.uniform_int(1, 80)
                dense = rng.dense_matrix(rows, cols,
                                         rng.uniform(0.05, 0.5))
                csr = csr_from_dense(dense)
            x = rng.vector(cols)
            cfg = SpMVConfig(kernel_type=kernel_type)
            res = spmv_csr(csr, x, cfg)
            assert res.error_code == 0
            assert spmv_matches(res.y_host(), csr, x), \
                f"{kernel_type.name} mismatch rows={rows} cols={cols}"

    def test_large_skewed(self, rng):
        """Merge-path on a power-law matrix (requirements.md:68 regime)."""
        csr = rng.power_law_csr(300, 300, avg_nnz=6.0)
        x = rng.vector(300)
        for kt in ALL_CSR_KERNELS:
            res = spmv_csr(csr, x, SpMVConfig(kernel_type=kt))
            assert res.error_code == 0
            assert spmv_matches(res.y_host(), csr, x, rel_tol=1e-5), kt.name


class TestProperty9ELL:
    """Property 9: ELL device kernel vs CPU (test_spmv.cu:82-118)."""

    def test_ell_device(self, rng):
        for _ in range(DEVICE_PROP_ITERS):
            rows = rng.uniform_int(1, 60)
            cols = rng.uniform_int(1, 60)
            dense = rng.dense_matrix(rows, cols, rng.uniform(0.05, 0.4))
            ell = ell_from_dense(dense)
            x = rng.vector(cols)
            expected = spmv_cpu_ell(ell, x)
            res = spmv_ell(ell, x)
            assert res.error_code == 0
            # the Pallas ELL path accumulates in packed-cell order, not the
            # oracle's slot order — compare with the reordered-summation
            # backward-error bound (see spmv_matches docstring)
            assert spmv_matches(res.y_host(), ell.to_csr(), x, rel_tol=1e-5)
            assert spmv_rel_equal(res.y_host(), expected, rel_tol=1e-3)


class TestProperty10DimensionValidation:
    """Property 10: dimension mismatches rejected before device work
    (test_spmv.cu:122-145, spmv_kernels.cu:219-232)."""

    def test_validate_dimensions(self):
        assert spmv_validate_dimensions(5, 5)
        assert not spmv_validate_dimensions(5, 4)

    def test_mismatched_x(self, rng):
        csr = csr_from_dense(rng.dense_matrix(10, 10, 0.3))
        res = spmv_csr(csr, rng.vector(7))
        assert res.error_code == int(SpMVError.INVALID_DIMENSION)
        assert res.y is None

    def test_null_arguments(self):
        res = spmv_csr(None, np.ones(3, np.float32))
        assert res.error_code == int(SpMVError.INVALID_ARGUMENT)
        csr = csr_from_dense(np.eye(3, dtype=np.float32))
        res = spmv_csr(csr, None)
        assert res.error_code == int(SpMVError.INVALID_ARGUMENT)

    def test_explicit_vec_size(self, rng):
        csr = csr_from_dense(rng.dense_matrix(8, 8, 0.3))
        res = spmv_csr(csr, rng.vector(8), vec_size=9)
        assert res.error_code == int(SpMVError.INVALID_DIMENSION)


class TestEdgeCases:
    def test_empty_matrix(self):
        # test_spmv.cu:148-159
        csr = csr_from_dense(np.zeros((0, 0), np.float32))
        res = spmv_csr(csr, np.zeros(0, np.float32))
        assert res.error_code == 0
        assert res.y_host().shape == (0,)

    def test_single_element(self):
        # test_spmv.cu:161-186
        csr = csr_from_dense(np.array([[3.0]], np.float32))
        for kt in ALL_CSR_KERNELS:
            res = spmv_csr(csr, np.array([2.0], np.float32),
                           SpMVConfig(kernel_type=kt))
            assert res.error_code == 0
            np.testing.assert_allclose(res.y_host(), [6.0])

    def test_zero_rows_inside(self, rng):
        # test_spmv.cu:188-218: rows with no nnz produce y = 0
        dense = rng.dense_matrix(10, 10, 0.4)
        dense[3, :] = 0.0
        dense[7, :] = 0.0
        csr = csr_from_dense(dense)
        x = rng.vector(10)
        for kt in ALL_CSR_KERNELS:
            res = spmv_csr(csr, x, SpMVConfig(kernel_type=kt))
            y = res.y_host()
            assert y[3] == 0.0 and y[7] == 0.0

    def test_all_zero_matrix(self, rng):
        csr = csr_from_dense(np.zeros((5, 5), np.float32))
        for kt in ALL_CSR_KERNELS:
            res = spmv_csr(csr, rng.vector(5), SpMVConfig(kernel_type=kt))
            np.testing.assert_array_equal(res.y_host(), np.zeros(5))

    def test_measure_fills_metrics(self, rng):
        csr = csr_from_dense(rng.dense_matrix(32, 32, 0.2))
        res = spmv_csr(csr, rng.vector(32), measure=True, measure_iters=2)
        assert res.elapsed_ms > 0.0
        assert res.gflops >= 0.0
        assert res.bandwidth is not None
        assert 0.0 <= res.bandwidth.efficiency <= 1.0


class TestPatternDispatch:
    """SpMVConfig.pattern routes column-scaled matrices through PATTERN
    plans (no f32 vals stream) and degrades silently otherwise."""

    @staticmethod
    def _transition(n, m, seed):
        from tpu_spmv.csr import CSRMatrix

        g = np.random.default_rng(seed)
        rows = g.integers(0, n, m)
        cols = g.integers(0, n, m)
        keep = rows != cols
        rows, cols = rows[keep], cols[keep]
        outdeg = np.bincount(cols, minlength=n)
        vals = (1.0 / np.maximum(outdeg, 1)[cols]).astype(np.float32)
        order = np.lexsort((cols, rows))
        ptr = np.zeros(n + 1, np.int64)
        np.cumsum(np.bincount(rows, minlength=n), out=ptr[1:])
        return CSRMatrix(n, n, vals[order], cols[order].astype(np.int32),
                         ptr.astype(np.int32))

    def test_factorable_matches_oracle(self, rng):
        from tpu_spmv.kernels.window_ell import spmv_pattern, \
            spmv_pattern_banded
        from tpu_spmv.spmv import _resolve_csr_kernel

        A = self._transition(1500, 12000, seed=4)
        x = rng.vector(1500)
        cfg = SpMVConfig(kernel_type=KernelType.MERGE_PATH, pattern=True)
        fn, args = _resolve_csr_kernel(A, KernelType.MERGE_PATH, cfg)
        assert fn in (spmv_pattern, spmv_pattern_banded)
        assert args[0].pat if fn is spmv_pattern \
            else all(p.pat for p in args[0].plans)
        res = spmv_csr(A, x, cfg)
        assert res.error_code == 0
        assert spmv_matches(res.y_host(), A, x, rel_tol=1e-5)

    def test_non_factorable_degrades_to_generic(self, rng):
        csr = csr_from_dense(rng.dense_matrix(300, 300, 0.05))
        x = rng.vector(300)
        res_p = spmv_csr(csr, x,
                         SpMVConfig(kernel_type=KernelType.MERGE_PATH,
                                    pattern=True))
        res_g = spmv_csr(csr, x,
                         SpMVConfig(kernel_type=KernelType.MERGE_PATH))
        assert res_p.error_code == 0
        np.testing.assert_array_equal(res_p.y_host(), res_g.y_host())

    def test_ell_pattern_dispatch(self, rng):
        from tpu_spmv import spmv_ell
        from tpu_spmv.ell import ELLMatrix

        A = self._transition(600, 3000, seed=11)
        if A.compute_stats().max_nnz_per_row > 64:
            import pytest

            pytest.skip("ELL conversion too wide for this draw")
        ell = ELLMatrix.from_csr(A)
        x = rng.vector(600)
        res_p = spmv_ell(ell, x, SpMVConfig(pattern=True))
        res_g = spmv_ell(ELLMatrix.from_csr(A), x)
        assert res_p.error_code == 0
        assert spmv_matches(res_p.y_host(), A, x, rel_tol=1e-5)
        np.testing.assert_allclose(res_p.y_host(), res_g.y_host(),
                                   rtol=1e-4)
