"""PageRank tests (C15) — mirrors ``tests/test_pagerank.cu``."""

import numpy as np

from tpu_spmv import (
    PageRankConfig,
    csr_from_dense,
    pagerank,
    pagerank_top_k,
)

from conftest import DEVICE_PROP_ITERS


def column_normalized_adjacency(rng, n, density=0.2):
    """Random column-normalized adjacency like the reference demo
    (main.cu:102-112)."""
    adj = (rng.rng.random((n, n)) < density).astype(np.float32)
    np.fill_diagonal(adj, 0.0)
    col_sums = adj.sum(axis=0)
    nz = col_sums > 0
    adj[:, nz] /= col_sums[nz]
    return csr_from_dense(adj)


class TestProperty15Invariants:
    """Property 15: ranks non-negative, sum to 1 (±1e-4), converged or hit
    max iterations (test_pagerank.cu:18-77)."""

    def test_invariants(self, rng):
        for _ in range(max(DEVICE_PROP_ITERS // 2, 5)):
            n = rng.uniform_int(5, 60)
            adj = column_normalized_adjacency(rng, n)
            cfg = PageRankConfig(max_iterations=100)
            res = pagerank(adj, cfg)
            ranks = res.ranks_host()
            assert ranks.shape == (n,)
            assert np.all(ranks >= 0)
            assert abs(ranks.sum() - 1.0) < 1e-4
            assert res.converged or res.iterations == cfg.max_iterations
            if res.converged:
                assert res.final_residual < cfg.tolerance

    def test_matches_host_power_iteration(self, rng):
        """Cross-check the full on-device loop against a NumPy reference."""
        n = 40
        adj = column_normalized_adjacency(rng, n)
        cfg = PageRankConfig(max_iterations=100, tolerance=1e-6)
        res = pagerank(adj, cfg)

        dense = adj.to_dense()
        dangling = (dense.sum(axis=0) == 0.0).astype(np.float32)
        r = np.full(n, 1.0 / n, np.float32)
        for _ in range(cfg.max_iterations):
            r_new = (cfg.damping_factor * (dense @ r)
                     + cfg.damping_factor * float(dangling @ r) / n
                     + (1 - cfg.damping_factor) / n).astype(np.float32)
            resid = float(np.linalg.norm(r_new - r))
            r, r_prev = r_new, r
            if resid < cfg.tolerance:
                break
        r = r / r.sum()
        np.testing.assert_allclose(res.ranks_host(), r, rtol=1e-4, atol=1e-6)


class TestProperty16TopK:
    """Property 16: top-k is sorted descending and contains the true
    maxima (test_pagerank.cu:81-137)."""

    def test_topk(self, rng):
        for _ in range(max(DEVICE_PROP_ITERS // 2, 5)):
            n = rng.uniform_int(10, 50)
            adj = column_normalized_adjacency(rng, n)
            res = pagerank(adj)
            k = rng.uniform_int(1, n)
            top = pagerank_top_k(res, n, k)
            assert len(top) == min(k, n)
            ranks = [t.rank for t in top]
            assert all(ranks[i] >= ranks[i + 1] for i in range(len(ranks) - 1))
            true_sorted = np.sort(res.ranks_host())[::-1]
            np.testing.assert_allclose(ranks, true_sorted[:k], rtol=1e-6)

    def test_k_larger_than_n(self, rng):
        adj = column_normalized_adjacency(rng, 8)
        res = pagerank(adj)
        top = pagerank_top_k(res, 8, 20)
        assert len(top) == 8


class TestSymmetry:
    def test_3cycle_symmetric_ranks(self):
        """A 3-cycle gives equal ranks (test_pagerank.cu:140-164)."""
        adj = np.array([[0, 0, 1], [1, 0, 0], [0, 1, 0]], np.float32)
        res = pagerank(csr_from_dense(adj))
        ranks = res.ranks_host()
        np.testing.assert_allclose(ranks, [1 / 3] * 3, atol=1e-5)
        assert res.converged

    def test_null_and_empty(self):
        assert pagerank(None).ranks is None
        res = pagerank(csr_from_dense(np.zeros((0, 0), np.float32)))
        assert res.ranks_host().shape == (0,)


class TestResume:
    """Checkpoint/resume — TPU-build extension (SURVEY §5: the reference's
    PageRank cannot resume)."""

    def test_save_load_resume(self, rng, tmp_path):
        import numpy as np
        from tpu_spmv import (PageRankConfig, pagerank, pagerank_load_state,
                              pagerank_save_state)
        from tpu_spmv.csr import csr_from_dense

        n = 40
        adj = (rng.rng.random((n, n)) < 0.2).astype(np.float32)
        np.fill_diagonal(adj, 0.0)
        cs = adj.sum(axis=0)
        nz = cs > 0
        adj[:, nz] /= cs[nz]
        csr = csr_from_dense(adj)

        # run 5 iterations, checkpoint, resume — must match a straight run
        partial = pagerank(csr, PageRankConfig(max_iterations=5,
                                               tolerance=0.0))
        path = tmp_path / "state.npz"
        pagerank_save_state(partial, path)
        loaded = pagerank_load_state(path)
        assert loaded.iterations == partial.iterations
        resumed = pagerank(csr, PageRankConfig(max_iterations=95),
                           initial_ranks=loaded.ranks)
        straight = pagerank(csr, PageRankConfig(max_iterations=100))
        assert resumed.converged and straight.converged
        np.testing.assert_allclose(resumed.ranks_host(),
                                   straight.ranks_host(),
                                   rtol=1e-4, atol=1e-7)


def _column_normalized(rng_np, n, m):
    """A column-normalized transition matrix (values 1/outdeg[col])."""
    import numpy as np

    from tpu_spmv.csr import CSRMatrix

    rows = rng_np.integers(0, n, m)
    cols = rng_np.integers(0, n, m)
    keep = rows != cols
    rows, cols = rows[keep], cols[keep]
    outdeg = np.bincount(cols, minlength=n)
    vals = (1.0 / outdeg[cols]).astype(np.float32)
    order = np.lexsort((cols, rows))
    ptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=ptr[1:])
    return CSRMatrix(n, n, vals[order], cols[order].astype(np.int32),
                     ptr.astype(np.int32))


def test_column_scale_factor_detection():
    import numpy as np

    from tpu_spmv.pagerank import column_scale_factor

    rng_np = np.random.default_rng(9)
    A = _column_normalized(rng_np, 500, 4000)
    s = column_scale_factor(A)
    assert s is not None
    np.testing.assert_array_equal(s[A.col_indices], A.values)
    # breaking one value breaks the factorization
    A.values[0] *= 2.0
    if np.count_nonzero(A.col_indices == A.col_indices[0]) > 1:
        assert column_scale_factor(A) is None


def test_pagerank_pattern_path_matches_generic():
    """The pattern fast path (no vals stream, x pre-scaled) converges to
    the same ranks as the generic kernel path."""
    import numpy as np

    from tpu_spmv import pagerank
    from tpu_spmv.pagerank import KernelType, PageRankConfig

    rng_np = np.random.default_rng(3)
    A = _column_normalized(rng_np, 2000, 16000)
    r_pat = pagerank(A)
    r_gen = pagerank(A, PageRankConfig(kernel_type=KernelType.SCALAR_CSR))
    assert r_pat.converged and r_gen.converged
    assert r_pat.iterations == r_gen.iterations
    assert np.abs(r_pat.ranks_host() - r_gen.ranks_host()).max() < 1e-6


def test_pagerank_non_factorable_matrix_still_works(rng):
    """Row-scaled (not column-scaled) values defeat the pattern
    detection; pagerank falls back to the generic dispatch."""
    import numpy as np

    from tpu_spmv import pagerank
    from tpu_spmv.pagerank import column_scale_factor

    n = 400
    dense = np.abs(rng.dense_matrix(n, n, 0.02))
    np.fill_diagonal(dense, 0.0)
    # row-normalize: values vary within a column
    rs = dense.sum(axis=1, keepdims=True)
    dense = np.divide(dense, rs, out=np.zeros_like(dense), where=rs > 0)
    from tpu_spmv import csr_from_dense

    A = csr_from_dense(dense.astype(np.float32))
    if A.nnz:
        assert column_scale_factor(A) is None or np.unique(
            A.col_indices).size == A.nnz
    res = pagerank(A)
    assert res.error_code == 0 and res.ranks is not None
