"""bf16 value-stream mode (round 4) — the TPU-native reduced-precision
opt-in (no reference counterpart; the reference is fp32-only).

``WindowEllPlan.build(values_dtype=jnp.bfloat16)`` halves the dominant
per-slot stream (5.5 → 3.5 B) and the plan footprint; the kernel
converts to f32 at load and accumulates in f32, so the error budget is
bf16 VALUE rounding only (~2^-8 of each product).  The honest error
metric is per-row: |y - y_ref| ≤ ~4e-3 · Σ|v·x| (cancellation can make
a naive relative-error metric arbitrarily large near zero crossings).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_spmv import KernelType, SpMVConfig, spmv_csr
from tpu_spmv.kernels.window_ell import WindowEllPlan, spmv_window_ell
from tpu_spmv.ops.cpu_reference import spmv_cpu_csr
from tpu_spmv.utils.testing import RandomGenerator


@pytest.fixture
def rng():
    return RandomGenerator(42)


def _row_mass(m, x):
    mass = np.zeros(m.num_rows, np.float32)
    rl = np.diff(m.row_ptrs)
    np.add.at(mass, np.repeat(np.arange(m.num_rows), rl),
              np.abs(m.values * x[m.col_indices]))
    return mass


def _check_bf16(y, m, x, tol=5e-3):
    yref = np.zeros(m.num_rows, np.float32)
    spmv_cpu_csr(m, x, yref)
    mass = _row_mass(m, x)
    assert np.all(np.abs(y - yref) <= tol * mass + 1e-6)


class TestBf16Values:
    def test_plan_correct_within_rounding(self, rng):
        m = rng.power_law_csr(2048, 1024, avg_nnz=10, alpha=1.6)
        x = rng.vector(1024)
        p = WindowEllPlan.build(m, split_rows=128, step_groups=8,
                                values_dtype=jnp.bfloat16)
        assert p.vals.dtype == jnp.bfloat16
        _check_bf16(np.asarray(spmv_window_ell(p, jnp.asarray(x))), m, x)

    def test_stream_accounting_half_width(self, rng):
        m = rng.power_law_csr(1024, 1024, avg_nnz=8, alpha=1.6)
        p32 = WindowEllPlan.build(m, split_rows=128, step_groups=8)
        p16 = WindowEllPlan.build(m, split_rows=128, step_groups=8,
                                  values_dtype=jnp.bfloat16)
        slots32 = p32.n_groups * 8 * 128
        slots16 = p16.n_groups * 8 * 128
        # same layout, 2 B/slot less streamed
        assert p16.n_groups == p32.n_groups
        assert p32.stream_bytes - p16.stream_bytes == \
            pytest.approx(2.0 * slots32)
        assert slots16 == slots32

    def test_dispatch_knob(self, rng):
        m = rng.power_law_csr(1024, 512, avg_nnz=8, alpha=1.6)
        x = rng.vector(512)
        cfg = SpMVConfig(kernel_type=KernelType.MERGE_PATH, block_size=16,
                         bf16_values=True)
        r = spmv_csr(m, x, cfg)
        assert r.error_code == 0
        _check_bf16(np.asarray(r.y), m, x)
        # the f32 and bf16 plans must not share a cache entry
        r32 = spmv_csr(m, x, SpMVConfig(kernel_type=KernelType.MERGE_PATH,
                                        block_size=16))
        assert not np.array_equal(np.asarray(r.y), np.asarray(r32.y))

    def test_plan_io_roundtrip(self, rng, tmp_path):
        m = rng.power_law_csr(1024, 512, avg_nnz=8, alpha=1.6)
        x = rng.vector(512)
        p = WindowEllPlan.build(m, split_rows=128, step_groups=8,
                                values_dtype=jnp.bfloat16)
        path = str(tmp_path / "bf16.plan")
        p.save(path)
        p2 = WindowEllPlan.load(path)
        assert p2.vals.dtype == jnp.bfloat16
        y1 = np.asarray(spmv_window_ell(p, jnp.asarray(x)))
        y2 = np.asarray(spmv_window_ell(p2, jnp.asarray(x)))
        assert np.array_equal(y1, y2)

    def test_leveled_bf16_compose(self, rng):
        m = rng.power_law_csr(2048, 1024, avg_nnz=10, alpha=1.6)
        x = rng.vector(1024)
        p = WindowEllPlan.build(m, split_rows=128, step_groups=8,
                                values_dtype=jnp.bfloat16,
                                permute_rows=True)
        assert p.lam is not None and p.vals.dtype == jnp.bfloat16
        _check_bf16(np.asarray(spmv_window_ell(p, jnp.asarray(x))), m, x)


class TestBf16Sharded:
    def test_sharded_bf16_matches_within_rounding(self, rng):
        import jax

        if len(jax.devices()) < 4:
            pytest.skip("needs the virtual multi-device mesh")
        from tpu_spmv.parallel import (make_row_mesh, shard_csr_packed,
                                       spmv_csr_sharded_packed)

        mesh = make_row_mesh(4)
        m = rng.power_law_csr(2048, 1024, avg_nnz=10, alpha=1.6)
        x = rng.vector(1024)
        sp = shard_csr_packed(m, mesh, values_dtype=jnp.bfloat16)
        y = np.asarray(spmv_csr_sharded_packed(sp, x, mesh))
        _check_bf16(y, m, x)
