"""Structure-adaptive reordering (kernels/reorder.py) — round 5.

Covers: the Pallas chunk-gather permutation, RCM block ordering on
planted structure, probe apply/skip decisions (locality vs iid), full
reordered-SpMV correctness vs the CPU oracle (Property-8 discipline,
``test_spmv.cu:40-78``), dispatch integration, and plan IO.

Device-path tests run on XLA-CPU in interpret mode like the rest of the
suite (conftest forces the CPU backend).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_spmv.csr import CSRMatrix
from tpu_spmv.kernels.reorder import (
    GAIN_THRESHOLD, ReorderedPlan, block_order, build_reordered,
    maybe_reorder, permute_chunks, permute_csr, reorder_gain,
    spmv_reordered)
from tpu_spmv.ops.cpu_reference import spmv_cpu_csr
from tpu_spmv.utils.testing import (
    RandomGenerator, clustered_csr, scrambled_banded_csr, spmv_matches,
    web_graph_csr)


@pytest.fixture
def rng():
    return RandomGenerator(42)


# --------------------------------------------------------------------------
# the Pallas chunk-gather


def test_permute_chunks_matches_numpy(rng):
    gen = np.random.default_rng(7)
    for n, nb_out in ((1024, 8), (5000, 64), (128 * 130, 100)):
        x = rng.vector(n)
        n_src = -(-n // 128)
        src = gen.integers(0, n_src, nb_out).astype(np.int32)
        out = np.asarray(permute_chunks(jnp.asarray(x), jnp.asarray(src),
                                        nb_out * 128))
        ref = np.pad(x, (0, -(-n_src // 8) * 8 * 128 - n)) \
            .reshape(-1, 128)[src].reshape(-1)
        assert np.array_equal(out, ref)


def test_permute_chunks_roundtrip_inverse(rng):
    x = rng.vector(4096)
    gen = np.random.default_rng(3)
    order = gen.permutation(32).astype(np.int32)
    pos = np.empty(32, np.int64)
    pos[order] = np.arange(32)
    xp = permute_chunks(jnp.asarray(x), jnp.asarray(order), 4096)
    back = permute_chunks(xp, jnp.asarray(pos.astype(np.int32)), 4096)
    assert np.array_equal(np.asarray(back), x)


# --------------------------------------------------------------------------
# clustering + probe


def test_block_order_is_permutation(rng):
    A = clustered_csr(rng, 8192, n_clusters=8, avg_nnz=8.0)
    order = block_order(A)
    assert sorted(order.tolist()) == list(range(len(order)))


def test_block_order_recovers_planted_bands(rng):
    A = scrambled_banded_csr(rng, 65536, bandwidth=2048, avg_nnz=8.0)
    order = block_order(A)
    nb = len(order)
    pos = np.empty(nb, np.int64)
    pos[order] = np.arange(nb)
    rows_of = np.repeat(np.arange(A.num_rows, dtype=np.int64),
                        np.diff(A.row_ptrs).astype(np.int64))
    d = np.abs(pos[rows_of // 128] - pos[A.col_indices.astype(np.int64)
                                         // 128])
    # latent band = 2048 cols = 16 blocks; RCM should put the vast
    # majority of edges within a ~2x-band block distance
    assert float((d <= 48).mean()) > 0.9


def test_gain_model_prefers_recovered_order(rng):
    A = scrambled_banded_csr(rng, 65536, bandwidth=2048, avg_nnz=8.0)
    nat, prm = reorder_gain(A, block_order(A))
    assert prm < GAIN_THRESHOLD * nat


def test_probe_skips_iid(rng):
    A = web_graph_csr(rng, 65536, 65536, avg_nnz=8.0)
    # structure gates pass; the gain gate must reject iid structure
    assert maybe_reorder(A) is None


def test_probe_skips_rectangular_and_tiny(rng):
    A = web_graph_csr(rng, 65536, 32768, avg_nnz=8.0)
    assert maybe_reorder(A) is None          # not square
    B = clustered_csr(rng, 2048, n_clusters=4, avg_nnz=8.0)
    assert maybe_reorder(B) is None          # below the size gate


def test_probe_applies_on_planted_locality(rng):
    A = scrambled_banded_csr(rng, 65536, bandwidth=2048, avg_nnz=8.0)
    order = maybe_reorder(A)
    assert order is not None
    # and the permuted build is structurally better (fewer groups)
    from tpu_spmv.kernels.window_ell import build_auto

    _, p_nat = build_auto(A)
    _, rp = build_reordered(A, order=order)
    assert rp.n_groups < 0.7 * p_nat.n_groups


def test_probe_env_disable(rng, monkeypatch):
    A = scrambled_banded_csr(rng, 65536, bandwidth=2048, avg_nnz=8.0)
    monkeypatch.setenv("TPU_SPMV_REORDER", "0")
    assert maybe_reorder(A) is None


# --------------------------------------------------------------------------
# correctness (Property 8 through the reordered path)


def _check_matches(A, rng):
    x = rng.vector(A.num_cols)
    fn, rp = build_reordered(A)
    y = np.asarray(fn(rp, jnp.asarray(x)))
    assert spmv_matches(y, A, x, rel_tol=1e-5)


def test_reordered_spmv_matches_oracle_clustered(rng):
    _check_matches(clustered_csr(rng, 16384, n_clusters=16, avg_nnz=8.0),
                   rng)


def test_reordered_spmv_matches_oracle_banded(rng):
    _check_matches(scrambled_banded_csr(rng, 16384, bandwidth=1024,
                                        avg_nnz=6.0), rng)


def test_reordered_spmv_unaligned_dims(rng):
    # num_rows/cols not multiples of 128: pad blocks live mid-permutation
    A = clustered_csr(rng, 8192, n_clusters=8, avg_nnz=8.0,
                      block_shuffle=False)
    B = CSRMatrix(8000, 8000,
                  A.values[: A.row_ptrs[8000]],
                  np.minimum(A.col_indices[: A.row_ptrs[8000]], 7999),
                  A.row_ptrs[: 8001])
    _check_matches(B, rng)


def test_reordered_split_rows_merge_path(rng):
    A = scrambled_banded_csr(rng, 16384, bandwidth=1024, avg_nnz=6.0)
    x = rng.vector(A.num_cols)
    fn, rp = build_reordered(A, split_rows=128)
    y = np.asarray(fn(rp, jnp.asarray(x)))
    assert spmv_matches(y, A, x, rel_tol=1e-5)


# --------------------------------------------------------------------------
# dispatch integration + IO


def test_dispatch_uses_reorder_when_forced(rng):
    from tpu_spmv.spmv import SpMVConfig, KernelType, _plan_for

    A = scrambled_banded_csr(rng, 16384, bandwidth=1024, avg_nnz=6.0)
    fn, plan = _plan_for(A, KernelType.VECTOR_CSR, None, reorder=True)
    assert isinstance(plan, ReorderedPlan)
    x = rng.vector(A.num_cols)
    y = np.asarray(fn(plan, jnp.asarray(x)))
    assert spmv_matches(y, A, x, rel_tol=1e-5)


def test_dispatch_reorder_off_by_config(rng):
    from tpu_spmv.spmv import KernelType, _plan_for

    A = scrambled_banded_csr(rng, 16384, bandwidth=1024, avg_nnz=6.0)
    fn, plan = _plan_for(A, KernelType.VECTOR_CSR, None, reorder=False)
    assert not isinstance(plan, ReorderedPlan)


def test_public_spmv_csr_with_reorder(rng):
    import tpu_spmv as t

    A = scrambled_banded_csr(rng, 16384, bandwidth=1024, avg_nnz=6.0)
    x = rng.vector(A.num_cols)
    cfg = t.SpMVConfig(kernel_type=t.KernelType.VECTOR_CSR, reorder=True)
    r = t.spmv_csr(A, x, cfg)
    assert r.error_code == 0
    assert spmv_matches(np.asarray(r.y), A, x, rel_tol=1e-5)


def test_reordered_plan_io_roundtrip(tmp_path, rng):
    A = scrambled_banded_csr(rng, 16384, bandwidth=1024, avg_nnz=6.0)
    x = rng.vector(A.num_cols)
    fn, rp = build_reordered(A)
    y0 = np.asarray(fn(rp, jnp.asarray(x)))
    p = str(tmp_path / "plan.npz")
    rp.save(p)
    rp2 = ReorderedPlan.load(p)
    assert isinstance(rp2, ReorderedPlan)
    y1 = np.asarray(spmv_reordered(rp2, jnp.asarray(x)))
    assert np.array_equal(y0, y1)


def test_permute_csr_preserves_matrix(rng):
    A = clustered_csr(rng, 8192, n_clusters=8, avg_nnz=8.0)
    order = np.random.default_rng(5).permutation(-(-A.num_cols // 128))
    P = permute_csr(A, order)
    # spot-check 200 random elements through the coordinate relabel
    nb = len(order)
    pos = np.empty(nb, np.int64)
    pos[order] = np.arange(nb)
    gen = np.random.default_rng(6)
    rows_of = np.repeat(np.arange(A.num_rows, dtype=np.int64),
                        np.diff(A.row_ptrs).astype(np.int64))
    for k in gen.integers(0, A.nnz, 200):
        r, c, v = rows_of[k], int(A.col_indices[k]), A.values[k]
        pr = pos[r // 128] * 128 + r % 128
        pc = pos[c // 128] * 128 + c % 128
        assert P.get_element(int(pr), int(pc)) == v
