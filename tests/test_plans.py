"""Window-ELL planner structural tests (the packed layout behind the
VECTOR_CSR / MERGE_PATH kernels — no reference counterpart file; validates
the invariants §7 of SURVEY.md requires of the merge-path redesign:
deterministic, no atomics, bounded inflation)."""

import numpy as np
import pytest

from tpu_spmv import csr_from_dense
from tpu_spmv.kernels.window_ell import (
    WindowEllOverflow,
    WindowEllPlan,
    spmv_window_ell,
)
from tpu_spmv.ops import spmv_cpu_csr
from tpu_spmv.utils.testing import spmv_matches

from conftest import DEVICE_PROP_ITERS


def plan_slots_match_nnz(plan, csr):
    """Every nnz lands in exactly one slot (plus one unit-valued combine
    slot per extra row — the in-kernel fold of the extras scatter); all
    other slots are zero."""
    vals = np.asarray(plan.vals)
    assert float(np.abs(vals).sum()) == pytest.approx(
        float(np.abs(csr.values).sum()) + plan.n_extra, rel=1e-5)
    assert int((vals != 0).sum()) == \
        int((csr.values != 0).sum()) + plan.n_extra


class TestPlanStructure:
    def test_lane_alignment_invariant(self, rng):
        """Each slot's lo is the col % 128 of a nnz whose x entry lives in
        that sublane's table row — verified by running the kernel."""
        for _ in range(DEVICE_PROP_ITERS):
            rows = rng.uniform_int(1, 100)
            cols = rng.uniform_int(1, 100)
            csr = csr_from_dense(rng.dense_matrix(rows, cols, 0.3))
            plan = WindowEllPlan.build(csr)
            plan_slots_match_nnz(plan, csr)
            x = rng.vector(cols)
            y = np.asarray(spmv_window_ell(plan, x))
            assert spmv_matches(y, csr, x)

    def test_multi_window(self, rng):
        """Matrices wider than one 1024-col window."""
        rows, cols = 64, 3000
        dense = rng.dense_matrix(rows, cols, 0.02)
        csr = csr_from_dense(dense)
        plan = WindowEllPlan.build(csr)
        assert plan.cols_pad >= 3000
        x = rng.vector(cols)
        y = np.asarray(spmv_window_ell(plan, x))
        assert spmv_matches(y, csr, x)

    def test_row_splitting_combine(self, rng):
        """Merge-path mode: long rows split into virtual rows and combined
        exactly."""
        dense = np.zeros((40, 500), np.float32)
        dense[0, :] = rng.vector(500)   # one hub row
        dense[5, :10] = 1.0
        dense[39, 250:] = 2.0
        csr = csr_from_dense(dense)
        plan = WindowEllPlan.build(csr, split_rows=32)
        # extras: (ceil(500/32)-1) + 0 + (ceil(250/32)-1) from splitting,
        # plus any cap spills
        assert plan.n_extra >= 15 + 7
        x = rng.vector(500)
        y = np.asarray(spmv_window_ell(plan, x))
        assert spmv_matches(y, csr, x, rel_tol=1e-5)

    def test_concentrated_row_spills_not_explodes(self, rng):
        """Adversarial structure (all nnz in one (row, chunk)) is absorbed
        by the layer-cap spill instead of exploding layer counts."""
        dense = np.zeros((1, 128), np.float32)
        dense[0, :] = rng.vector(128)
        csr = csr_from_dense(dense)
        plan = WindowEllPlan.build(csr)
        x = rng.vector(128)
        y = np.asarray(spmv_window_ell(plan, x))
        assert spmv_matches(y, csr, x)

    def test_overflow_guard_class_exists(self):
        """The overflow escape hatch stays part of the API contract."""
        assert issubclass(WindowEllOverflow, Exception)

    def test_occupancy_reported(self, rng):
        csr = csr_from_dense(rng.dense_matrix(128, 128, 0.5))
        plan = WindowEllPlan.build(csr)
        assert 0.0 < plan.occupancy <= 1.0

    def test_empty_matrix_plan(self):
        csr = csr_from_dense(np.zeros((4, 4), np.float32))
        plan = WindowEllPlan.build(csr)
        y = np.asarray(spmv_window_ell(plan, np.ones(4, np.float32)))
        np.testing.assert_array_equal(y, np.zeros(4, np.float32))


class TestCapacityGuards:
    def test_wide_matrix_falls_back_to_scalar(self, rng):
        """Wide column-skewed structures that would exceed the SMEM window
        table must raise WindowEllOverflow from the planner and still give
        correct results through spmv_csr's scalar fallback."""
        import numpy as np
        from tpu_spmv import KernelType, SpMVConfig, spmv_csr
        from tpu_spmv.csr import CSRMatrix

        rows = 2048
        cols = 1 << 22  # wider than VMEM_X_MAX_COLS
        nnz_per_row = 4
        rng2 = rng.rng
        cols_arr = rng2.integers(0, cols, rows * nnz_per_row).astype(np.int32)
        row_ptrs = (np.arange(rows + 1) * nnz_per_row).astype(np.int32)
        vals = rng2.uniform(0.5, 1.0, rows * nnz_per_row).astype(np.float32)
        csr = CSRMatrix(rows, cols, vals, cols_arr, row_ptrs)
        x = np.ones(cols, np.float32)
        res = spmv_csr(csr, x, SpMVConfig(kernel_type=KernelType.MERGE_PATH))
        assert res.error_code == 0
        # every row sums its 4 values (x == 1)
        expected = vals.reshape(rows, nnz_per_row).sum(axis=1)
        np.testing.assert_allclose(res.y_host(), expected, rtol=1e-5)


class TestPermuteRows:
    """``build(permute_rows=True)``: within-superblock row→lane leveling.
    The plan computes on a row-permuted matrix; ``lam`` restores row
    order with one per-tile lane gather — the public y contract is
    byte-identical to natural-order plans."""

    def test_matches_oracle_random(self, rng):
        for _ in range(DEVICE_PROP_ITERS):
            rows = rng.uniform_int(1, 300)
            cols = rng.uniform_int(1, 300)
            csr = csr_from_dense(rng.dense_matrix(rows, cols, 0.2))
            plan = WindowEllPlan.build(csr, permute_rows=True)
            x = rng.vector(cols)
            y = np.asarray(spmv_window_ell(plan, x))
            assert spmv_matches(y, csr, x)

    def test_identical_output_to_natural_plan(self, rng):
        """The leveling is pure layout: every row still sums exactly its
        own nonzeros, so y agrees with the natural plan to fp32
        reassociation tolerance (the addition ORDER per row may differ)."""
        csr = rng.power_law_csr(2000, 1500, avg_nnz=12.0, alpha=1.6)
        x = rng.vector(1500)
        y_nat = np.asarray(spmv_window_ell(
            WindowEllPlan.build(csr, split_rows=128), x))
        y_perm = np.asarray(spmv_window_ell(
            WindowEllPlan.build(csr, split_rows=128, permute_rows=True), x))
        scale = float(np.abs(y_nat).max())
        np.testing.assert_allclose(y_perm, y_nat, rtol=1e-4,
                                   atol=1e-5 * scale)

    def test_leveling_does_not_add_groups(self, rng):
        """On skewed structure the leveler's whole point is fewer group
        layers; at minimum it must never be worse than natural order."""
        csr = rng.power_law_csr(4000, 2000, avg_nnz=15.0, alpha=1.6)
        nat = WindowEllPlan.build(csr, split_rows=128)
        lev = WindowEllPlan.build(csr, split_rows=128, permute_rows=True)
        assert lev.n_groups <= nat.n_groups
        assert lev.lam is not None

    def test_lam_is_per_tile_permutation(self, rng):
        """lam rows are permutations of [0,128); a partial final tile's
        real rows gather only from lanes [0, tile_len)."""
        rows = 129 * 3 + 37          # partial final tile of 37 rows
        csr = rng.power_law_csr(rows, 900, avg_nnz=9.0, alpha=1.6)
        plan = WindowEllPlan.build(csr, permute_rows=True)
        assert plan.lam is not None
        lam = np.asarray(plan.lam)
        assert lam.shape[1] == 128
        for t in range(lam.shape[0]):
            assert sorted(lam[t].tolist()) == list(range(128))
        n_full, tail = divmod(rows, 128)
        assert (lam.reshape(-1)[n_full * 128:rows] < tail).all()
        x = rng.vector(900)
        y = np.asarray(spmv_window_ell(plan, x))
        assert spmv_matches(y, csr, x, rel_tol=1e-5)

    def test_disabled_without_balancer(self, rng, monkeypatch):
        """TPU_SPMV_NO_BALANCE (or a missing native library) degrades to
        a natural-order plan — correct, just unleveled."""
        monkeypatch.setenv("TPU_SPMV_NO_BALANCE", "1")
        csr = csr_from_dense(rng.dense_matrix(200, 200, 0.1))
        plan = WindowEllPlan.build(csr, permute_rows=True)
        assert plan.lam is None
        x = rng.vector(200)
        assert spmv_matches(np.asarray(spmv_window_ell(plan, x)), csr, x)

    def test_pytree_round_trip_keeps_lam(self, rng):
        import jax

        csr = csr_from_dense(rng.dense_matrix(150, 150, 0.1))
        plan = WindowEllPlan.build(csr, permute_rows=True)
        leaves, treedef = jax.tree_util.tree_flatten(plan)
        plan2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert (plan2.lam is None) == (plan.lam is None)
        x = rng.vector(150)
        assert spmv_matches(np.asarray(spmv_window_ell(plan2, x)), csr, x)

    def test_banded_permuted(self, rng):
        """Per-band leveling through build_banded (each band carries its
        own lam; spmv_banded unpermutes per band)."""
        from tpu_spmv.kernels.window_ell import build_banded, spmv_banded

        csr = rng.power_law_csr(3000, 1200, avg_nnz=8.0, alpha=1.6)
        bp = build_banded(csr, sup=1024, n_bands=2, permute_rows=True)
        assert len(bp.plans) >= 2
        x = rng.vector(1200)
        y = np.asarray(spmv_banded(bp, x))
        assert spmv_matches(y, csr, x, rel_tol=1e-5)


def test_autotune_returns_correct_plan(rng):
    """WindowEllPlan.autotune measures candidate step widths and returns
    a working plan (functional check on the CPU backend)."""
    import numpy as np

    from tpu_spmv.kernels.window_ell import WindowEllPlan, spmv_window_ell
    from tpu_spmv.utils.testing import spmv_matches

    csr = rng.power_law_csr(3000, 2000, avg_nnz=10.0, alpha=1.6)
    x = rng.vector(2000)
    plan = WindowEllPlan.autotune(csr, x, widths=(8, 16), iters=4)
    y = np.asarray(spmv_window_ell(plan, x))
    assert spmv_matches(y, csr, x, rel_tol=1e-5)


class TestPatternPlans:
    """``build(pattern=True)``: implicit unit values, no f32 vals stream
    (pad slots masked by the sentinel sub-block instead of zero values).
    Semantics: ``y = B @ x`` for the 0/1 structure of the input."""

    @staticmethod
    def _unit(csr):
        from tpu_spmv.csr import CSRMatrix

        return CSRMatrix(csr.num_rows, csr.num_cols,
                         np.ones(csr.nnz, np.float32),
                         csr.col_indices, csr.row_ptrs)

    def test_matches_unit_oracle_random(self, rng):
        for _ in range(DEVICE_PROP_ITERS):
            rows = rng.uniform_int(1, 250)
            cols = rng.uniform_int(1, 250)
            csr = csr_from_dense(rng.dense_matrix(rows, cols, 0.2))
            plan = WindowEllPlan.build(csr, pattern=True)
            assert plan.pat and plan.vals is None
            x = rng.vector(cols)
            y = np.asarray(spmv_window_ell(plan, x))
            assert spmv_matches(y, self._unit(csr), x)

    def test_sbn_sentinel_masks_pads(self, rng):
        """Forced-narrow (nibble-packed) pattern plans: pad slots carry
        sentinel nibble 15 and contribute nothing."""
        csr = rng.power_law_csr(2048, 512, avg_nnz=25.0, alpha=1.6)
        plan = WindowEllPlan.build(csr, split_rows=128, sup=1024,
                                   pattern=True)
        assert plan.sbn
        x = rng.vector(512)
        y = np.asarray(spmv_window_ell(plan, x))
        assert spmv_matches(y, self._unit(csr), x, rel_tol=1e-5)

    def test_pattern_with_row_leveling(self, rng):
        csr = rng.power_law_csr(3000, 1500, avg_nnz=10.0, alpha=1.6)
        plan = WindowEllPlan.build(csr, split_rows=128, pattern=True,
                                   permute_rows=True)
        assert plan.pat
        x = rng.vector(1500)
        y = np.asarray(spmv_window_ell(plan, x))
        assert spmv_matches(y, self._unit(csr), x, rel_tol=1e-5)

    def test_column_scaled_equivalence(self, rng):
        """A = B·diag(s) runs as B @ (s*x) with identical per-slot
        products — the PageRank fast-path identity."""
        csr = rng.power_law_csr(1500, 1000, avg_nnz=8.0, alpha=1.6)
        s = rng.vector(1000)
        vals = np.asarray(csr.values)
        vals[:] = s[np.asarray(csr.col_indices)]
        plan_nat = WindowEllPlan.build(csr)
        plan_pat = WindowEllPlan.build(csr, pattern=True)
        x = rng.vector(1000)
        y_nat = np.asarray(spmv_window_ell(plan_nat, x))
        y_pat = np.asarray(spmv_window_ell(plan_pat, s * x))
        scale = float(np.abs(y_nat).max()) or 1.0
        np.testing.assert_allclose(y_pat, y_nat, rtol=1e-4,
                                   atol=1e-5 * scale)

    def test_empty_matrix_pattern(self):
        csr = csr_from_dense(np.zeros((4, 4), np.float32))
        plan = WindowEllPlan.build(csr, pattern=True)
        y = np.asarray(spmv_window_ell(plan, np.ones(4, np.float32)))
        np.testing.assert_array_equal(y, np.zeros(4, np.float32))

    def test_stream_bytes_drop(self, rng):
        """The whole point: a pattern plan streams no vals (4 B/slot)."""
        csr = rng.power_law_csr(2048, 512, avg_nnz=25.0, alpha=1.6)
        nat = WindowEllPlan.build(csr, sup=1024)
        pat = WindowEllPlan.build(csr, sup=1024, pattern=True)
        assert pat.n_groups == nat.n_groups
        assert pat.stream_bytes < 0.45 * nat.stream_bytes


def test_composite_with_leveling(rng):
    """build_composite threads permute_rows into every level."""
    from tpu_spmv.kernels.window_ell import build_composite, spmv_composite

    csr = rng.power_law_csr(3000, 2000, avg_nnz=8.0, alpha=1.8)
    cp = build_composite(csr, permute_rows=True)
    assert any(p.lam is not None for p in cp.plans)
    x = rng.vector(2000)
    y = np.asarray(spmv_composite(cp, x))
    assert spmv_matches(y, csr, x, rel_tol=1e-5)
