"""Selector tests (C6) — mirrors ``tests/test_kernel_selector.cpp``."""

import numpy as np

from tpu_spmv import KernelType, csr_from_dense, spmv_auto_config
from tpu_spmv.selector import (
    AVG_NNZ_SCALAR_THRESHOLD,
    SKEWNESS_VECTOR_THRESHOLD,
)
from tpu_spmv.spmv import PACKED_MAX_COLS
from tpu_spmv.csr import CSRMatrix

from conftest import PROP_ITERS


class TestProperty11Validity:
    """Property 11: the selector always returns a valid config
    (test_kernel_selector.cpp:17-50)."""

    def test_always_valid(self, rng):
        for _ in range(PROP_ITERS):
            rows = rng.uniform_int(1, 60)
            cols = rng.uniform_int(1, 60)
            csr = csr_from_dense(rng.dense_matrix(rows, cols,
                                                  rng.uniform(0.0, 0.6)))
            cfg = spmv_auto_config(csr)
            assert cfg.kernel_type in (KernelType.SCALAR_CSR,
                                       KernelType.VECTOR_CSR,
                                       KernelType.MERGE_PATH)
            assert cfg.block_size > 0


def _csr_with_row_lengths(lengths, cols):
    """Build a CSR with exact per-row nnz counts."""
    rows = len(lengths)
    dense = np.zeros((rows, cols), np.float32)
    for i, length in enumerate(lengths):
        dense[i, :length] = 1.0
    return csr_from_dense(dense)


class TestHeuristicBranches:
    """One unit test per branch (test_kernel_selector.cpp:53-118)."""

    def test_sparse_rows_pick_scalar(self):
        # near-empty matrix: plan overhead dominates -> flat scalar path
        csr = _csr_with_row_lengths([1] + [0] * 63, 64)
        assert csr.compute_stats().avg_nnz_per_row < AVG_NNZ_SCALAR_THRESHOLD
        assert spmv_auto_config(csr).kernel_type == KernelType.SCALAR_CSR

    def test_uniform_rows_pick_vector(self):
        csr = _csr_with_row_lengths([8] * 64, 64)
        stats = csr.compute_stats()
        assert stats.avg_nnz_per_row >= AVG_NNZ_SCALAR_THRESHOLD
        assert stats.skewness < SKEWNESS_VECTOR_THRESHOLD
        assert spmv_auto_config(csr).kernel_type == KernelType.VECTOR_CSR

    def test_skewed_rows_pick_merge_path(self):
        lengths = [1] * 63 + [512]
        csr = _csr_with_row_lengths(lengths, 512)
        stats = csr.compute_stats()
        assert stats.skewness >= SKEWNESS_VECTOR_THRESHOLD
        assert stats.avg_nnz_per_row >= AVG_NNZ_SCALAR_THRESHOLD
        assert spmv_auto_config(csr).kernel_type == KernelType.MERGE_PATH

    def test_vmem_x_rule(self):
        """The texture-analog rule (test_kernel_selector.cpp:120-137):
        VMEM residency stays enabled at ANY width (round 4: column
        strips serve x beyond the packed cap on the packed kernels —
        kernels/strips.py); the flat path remains only for near-empty
        structure."""
        small = _csr_with_row_lengths([4] * 8, 100)
        assert spmv_auto_config(small).use_vmem_x
        # huge-cols matrix built directly (dense would not fit in memory)
        rows = 8
        cols = PACKED_MAX_COLS + 1
        row_ptrs = np.arange(rows + 1, dtype=np.int32) * 4
        big = CSRMatrix(rows, cols,
                        np.ones(rows * 4, np.float32),
                        np.tile(np.arange(4, dtype=np.int32), rows),
                        row_ptrs)
        cfg = spmv_auto_config(big)
        assert cfg.use_vmem_x
        # uniform 4-nnz rows: skew 1 → the lane-per-row packed kernel
        assert cfg.kernel_type == KernelType.VECTOR_CSR
