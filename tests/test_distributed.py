"""Distributed layer tests (new component) — row-sharded SpMV over a forced
multi-device CPU mesh, oracle = the same CPU reference on the unpartitioned
matrix (SURVEY §2 'Parallelism strategies')."""

import numpy as np
import pytest

import jax

from tpu_spmv import csr_from_dense
from tpu_spmv.ops import spmv_cpu_csr
from tpu_spmv.parallel import (
    make_row_mesh,
    pagerank_step_sharded,
    shard_csr,
    spmv_csr_sharded,
)
from tpu_spmv.pagerank import find_dangling_mask
from tpu_spmv.utils.testing import spmv_matches, spmv_rel_equal

needs_multi = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs >= 2 devices")


class TestShardedSpMV:
    @needs_multi
    def test_matches_oracle(self, rng, n_devices):
        mesh = make_row_mesh(n_devices)
        for _ in range(10):
            rows = rng.uniform_int(n_devices, 200)
            cols = rng.uniform_int(1, 200)
            csr = csr_from_dense(rng.dense_matrix(rows, cols, 0.2))
            x = rng.vector(cols)
            y = np.asarray(spmv_csr_sharded(shard_csr(csr, mesh), x, mesh))
            assert spmv_matches(y, csr, x)

    @needs_multi
    def test_skewed_matrix(self, rng, n_devices):
        mesh = make_row_mesh(n_devices)
        csr = rng.power_law_csr(150, 150, avg_nnz=5.0)
        x = rng.vector(150)
        y = np.asarray(spmv_csr_sharded(shard_csr(csr, mesh), x, mesh))
        assert spmv_matches(y, csr, x, rel_tol=1e-5)

    def test_single_device_mesh(self, rng):
        mesh = make_row_mesh(1)
        csr = csr_from_dense(rng.dense_matrix(30, 30, 0.3))
        x = rng.vector(30)
        y = np.asarray(spmv_csr_sharded(shard_csr(csr, mesh), x, mesh))
        assert spmv_matches(y, csr, x)

    @needs_multi
    def test_row_count_not_divisible(self, rng, n_devices):
        """Rows not a multiple of the shard count."""
        mesh = make_row_mesh(n_devices)
        rows = n_devices * 13 + 5
        csr = csr_from_dense(rng.dense_matrix(rows, 64, 0.15))
        x = rng.vector(64)
        y = np.asarray(spmv_csr_sharded(shard_csr(csr, mesh), x, mesh))
        assert spmv_matches(y, csr, x)


class TestShardedPageRankStep:
    @needs_multi
    def test_step_matches_dense(self, rng, n_devices):
        mesh = make_row_mesh(n_devices)
        n = 64
        dense = (rng.rng.random((n, n)) < 0.2).astype(np.float32)
        np.fill_diagonal(dense, 0.0)
        s = dense.sum(axis=0)
        dense[:, s > 0] /= s[s > 0]
        csr = csr_from_dense(dense)
        sharded = shard_csr(csr, mesh)
        mask = find_dangling_mask(csr)
        r = np.full(n, 1.0 / n, np.float32)
        out = np.asarray(pagerank_step_sharded(
            sharded, r, mask, damping=0.85, mesh=mesh))
        expected = 0.85 * (dense @ r) + 0.85 * float(mask @ r) / n + 0.15 / n
        assert spmv_rel_equal(out, expected.astype(np.float32), rel_tol=1e-5)


class TestDistributedPageRank:
    """Full on-device distributed power iteration (new component)."""

    def test_matches_single_device_pagerank(self, rng, n_devices):
        import numpy as np
        from tpu_spmv import PageRankConfig, pagerank
        from tpu_spmv.csr import csr_from_dense
        from tpu_spmv.pagerank import find_dangling_mask
        from tpu_spmv.parallel import (make_row_mesh, pagerank_sharded,
                                       shard_csr)

        n = 96
        adj = (rng.rng.random((n, n)) < 0.15).astype(np.float32)
        np.fill_diagonal(adj, 0.0)
        cs = adj.sum(axis=0)
        nz = cs > 0
        adj[:, nz] /= cs[nz]
        csr = csr_from_dense(adj)

        mesh = make_row_mesh(min(4, n_devices))
        sharded = shard_csr(csr, mesh)
        mask = find_dangling_mask(csr)
        dist = pagerank_sharded(sharded, mask, PageRankConfig(), mesh)
        single = pagerank(csr, PageRankConfig())
        assert dist.converged
        np.testing.assert_allclose(dist.ranks_host(), single.ranks_host(),
                                   rtol=1e-4, atol=1e-7)


class TestPackedSharding:
    """Row-sharded SpMV running the packed Pallas kernel per shard."""

    def test_packed_matches_oracle(self, rng, n_devices):
        import numpy as np
        from tpu_spmv.parallel import (make_row_mesh, shard_csr_packed,
                                       spmv_csr_sharded_packed)
        from tpu_spmv.utils.testing import spmv_matches

        csr = rng.power_law_csr(2048, 1500, avg_nnz=9, alpha=1.6)
        mesh = make_row_mesh(min(4, n_devices))
        sp = shard_csr_packed(csr, mesh)
        x = rng.vector(1500)
        y = np.asarray(spmv_csr_sharded_packed(sp, x, mesh))
        assert spmv_matches(y, csr, x, rel_tol=1e-5)

    def test_pagerank_sharded_packed(self, rng, n_devices):
        import numpy as np
        from tpu_spmv import PageRankConfig, pagerank
        from tpu_spmv.csr import csr_from_dense
        from tpu_spmv.pagerank import find_dangling_mask
        from tpu_spmv.parallel import (make_row_mesh, pagerank_sharded,
                                       shard_csr_packed)

        n = 96
        adj = (rng.rng.random((n, n)) < 0.15).astype(np.float32)
        np.fill_diagonal(adj, 0.0)
        cs = adj.sum(axis=0)
        nz = cs > 0
        adj[:, nz] /= cs[nz]
        csr = csr_from_dense(adj)
        mesh = make_row_mesh(min(4, n_devices))
        sp = shard_csr_packed(csr, mesh)
        mask = find_dangling_mask(csr)
        dist = pagerank_sharded(sp, mask, PageRankConfig(), mesh)
        single = pagerank(csr, PageRankConfig())
        assert dist.converged
        np.testing.assert_allclose(dist.ranks_host(), single.ranks_host(),
                                   rtol=1e-4, atol=1e-7)


class TestBalancedSharding:
    """Round-2: nnz-balanced row partitioning (VERDICT Weak #5)."""

    def test_power_law_imbalance_under_10_percent(self, rng):
        csr = rng.power_law_csr(4096, 512, avg_nnz=16, alpha=1.6)
        mesh = make_row_mesh(4)
        sharded = shard_csr(csr, mesh)
        assert sharded.nnz_imbalance < 0.10
        x = rng.vector(512)
        y = np.asarray(spmv_csr_sharded(sharded, x, mesh))
        assert spmv_matches(y, csr, x, rel_tol=1e-5)

    def test_packed_sharding_balanced_and_correct(self, rng):
        csr = rng.power_law_csr(8192, 1024, avg_nnz=12, alpha=1.6)
        mesh = make_row_mesh(4)
        from tpu_spmv.parallel import shard_csr_packed, spmv_csr_sharded_packed

        sp = shard_csr_packed(csr, mesh)
        assert sp.nnz_imbalance < 0.10
        x = rng.vector(1024)
        y = np.asarray(spmv_csr_sharded_packed(sp, x, mesh))
        assert spmv_matches(y, csr, x, rel_tol=1e-5)

    def test_init_distributed_single_process_noop(self, monkeypatch):
        from tpu_spmv.parallel import init_distributed

        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
        init_distributed()  # must not raise or try to reach a coordinator


class TestRingSharded:
    """Ring-pipelined x exchange (round 3): x row-sharded, packed
    footprint slices rotated with ppermute, per-pair packed plans."""

    @needs_multi
    def test_ring_matches_oracle(self, rng, n_devices):
        from tpu_spmv.parallel import shard_csr_ring, spmv_csr_ring

        mesh = make_row_mesh(n_devices)
        for _ in range(4):
            rows = rng.uniform_int(2 * n_devices, 300)
            cols = rng.uniform_int(n_devices, 300)
            csr = csr_from_dense(rng.dense_matrix(rows, cols, 0.15))
            x = rng.vector(cols)
            rs = shard_csr_ring(csr, mesh)
            y = np.asarray(spmv_csr_ring(rs, x, mesh))
            assert spmv_matches(y, csr, x, rel_tol=1e-5)

    @needs_multi
    def test_ring_power_law(self, rng, n_devices):
        from tpu_spmv.parallel import shard_csr_ring, spmv_csr_ring

        mesh = make_row_mesh(n_devices)
        csr = rng.power_law_csr(400, 400, avg_nnz=6.0)
        x = rng.vector(400)
        rs = shard_csr_ring(csr, mesh)
        y = np.asarray(spmv_csr_ring(rs, x, mesh))
        assert spmv_matches(y, csr, x, rel_tol=1e-5)

    @needs_multi
    def test_ring_banded_compresses(self, rng, n_devices):
        """A banded (stencil-like) matrix has a tiny cross-shard column
        footprint — the packed slice must be much smaller than the
        block, and the traffic model must prefer the ring."""
        from tpu_spmv.parallel import (ring_traffic_report, shard_csr_ring,
                                       spmv_csr_ring)

        n = 2048
        m = np.zeros((n, n), np.float32)
        for off in (-2, -1, 0, 1, 2):
            idx = np.arange(max(0, -off), min(n, n - off))
            m[idx, idx + off] = rng.uniform(0.5, 2.0)
        csr = csr_from_dense(m)
        mesh = make_row_mesh(n_devices)
        rs = shard_csr_ring(csr, mesh)
        x = rng.vector(n)
        y = np.asarray(spmv_csr_ring(rs, x, mesh))
        assert spmv_matches(y, csr, x, rel_tol=1e-5)
        rep = ring_traffic_report(rs)
        assert rep["ring_wins"]
        # halo of a 5-point band crosses at most ~4 columns per boundary
        assert rep["compression"] > 5.0

    @needs_multi
    def test_ring_traffic_fields(self, rng, n_devices):
        from tpu_spmv.parallel import ring_traffic_report, shard_csr_ring

        csr = rng.power_law_csr(256, 256, avg_nnz=5.0)
        rs = shard_csr_ring(csr, make_row_mesh(n_devices))
        rep = ring_traffic_report(rs)
        for k in ("replicate_bytes", "ring_bytes",
                  "ideal_pairwise_bytes", "compression", "ring_wins"):
            assert k in rep
        assert rep["ring_bytes"] > 0

    def test_ring_single_device(self, rng):
        from tpu_spmv.parallel import shard_csr_ring, spmv_csr_ring

        mesh = make_row_mesh(1)
        csr = csr_from_dense(rng.dense_matrix(60, 50, 0.2))
        x = rng.vector(50)
        rs = shard_csr_ring(csr, mesh)
        y = np.asarray(spmv_csr_ring(rs, x, mesh))
        assert spmv_matches(y, csr, x)


class TestPackedShardingVariants:
    """Pattern (no vals stream) and row-leveled shard plans through the
    same stacked shard_map path."""

    def test_permuted_shards_match_oracle(self, rng, n_devices):
        from tpu_spmv.parallel import (make_row_mesh, shard_csr_packed,
                                       spmv_csr_sharded_packed)

        csr = rng.power_law_csr(2048, 1500, avg_nnz=9, alpha=1.6)
        mesh = make_row_mesh(min(4, n_devices))
        sp = shard_csr_packed(csr, mesh, permute_rows=True)
        assert sp.has_lam
        x = rng.vector(1500)
        y = np.asarray(spmv_csr_sharded_packed(sp, x, mesh))
        assert spmv_matches(y, csr, x, rel_tol=1e-5)

    @staticmethod
    def _transition(rng_np, n, m):
        from tpu_spmv.csr import CSRMatrix

        rows = rng_np.integers(0, n, m)
        cols = rng_np.integers(0, n, m)
        keep = rows != cols
        rows, cols = rows[keep], cols[keep]
        outdeg = np.bincount(cols, minlength=n)
        vals = (1.0 / np.maximum(outdeg, 1)[cols]).astype(np.float32)
        order = np.lexsort((cols, rows))
        ptr = np.zeros(n + 1, np.int64)
        np.cumsum(np.bincount(rows, minlength=n), out=ptr[1:])
        return CSRMatrix(n, n, vals[order], cols[order].astype(np.int32),
                         ptr.astype(np.int32))

    def test_pattern_shards_match_oracle(self, rng, n_devices):
        from tpu_spmv.parallel import (make_row_mesh, shard_csr_packed,
                                       spmv_csr_sharded_packed)

        A = self._transition(np.random.default_rng(5), 2048, 14000)
        mesh = make_row_mesh(min(4, n_devices))
        sp = shard_csr_packed(A, mesh, pattern=True)
        assert sp.pat and sp.col_scale is not None
        x = rng.vector(2048)
        y = np.asarray(spmv_csr_sharded_packed(sp, x, mesh))
        assert spmv_matches(y, A, x, rel_tol=1e-5)

    def test_pattern_rejects_non_factorable(self, rng, n_devices):
        from tpu_spmv.errors import InvalidFormatError
        from tpu_spmv.parallel import make_row_mesh, shard_csr_packed

        csr = rng.power_law_csr(512, 512, avg_nnz=6, alpha=1.6)
        mesh = make_row_mesh(min(2, n_devices))
        with pytest.raises(InvalidFormatError):
            shard_csr_packed(csr, mesh, pattern=True)

    def test_pagerank_sharded_pattern(self, rng, n_devices):
        """Distributed PageRank over pattern+leveled shards converges to
        the single-device ranks."""
        from tpu_spmv import pagerank
        from tpu_spmv.parallel import (make_row_mesh, pagerank_sharded,
                                       shard_csr_packed)

        A = self._transition(np.random.default_rng(8), 1500, 10000)
        mask = find_dangling_mask(A)
        mesh = make_row_mesh(min(4, n_devices))
        sp = shard_csr_packed(A, mesh, pattern=True, permute_rows=True)
        res_d = pagerank_sharded(sp, mask, mesh=mesh)
        res_s = pagerank(A)
        assert res_d.converged
        assert res_d.iterations == res_s.iterations
        assert np.abs(res_d.ranks_host() - res_s.ranks_host()).max() < 1e-6


class TestRingCap:
    @needs_multi
    def test_ring_mesh_cap_overflows(self, rng, n_devices, monkeypatch):
        """Past TPU_SPMV_RING_MAX the quadratic block-pair build must
        raise WindowEllOverflow (the signal callers already catch to
        fall back to the replicated-packed form) — the round-5 policy
        for the O(n^2) plan growth (docs/RING_BUILD_r05.json)."""
        import pytest

        from tpu_spmv.kernels.window_ell import WindowEllOverflow
        from tpu_spmv.parallel import shard_csr_ring

        monkeypatch.setenv("TPU_SPMV_RING_MAX", str(n_devices - 1))
        mesh = make_row_mesh(n_devices)
        csr = rng.power_law_csr(256, 256, avg_nnz=6.0)
        with pytest.raises(WindowEllOverflow):
            shard_csr_ring(csr, mesh)

    @needs_multi
    def test_ring_cap_env_override(self, rng, n_devices, monkeypatch):
        """Raising the env cap re-enables the ring form."""
        from tpu_spmv.parallel import shard_csr_ring, spmv_csr_ring

        monkeypatch.setenv("TPU_SPMV_RING_MAX", str(n_devices))
        mesh = make_row_mesh(n_devices)
        csr = rng.power_law_csr(256, 256, avg_nnz=6.0)
        x = rng.vector(256)
        rs = shard_csr_ring(csr, mesh)
        y = np.asarray(spmv_csr_ring(rs, x, mesh))
        assert spmv_matches(y, csr, x, rel_tol=1e-5)
