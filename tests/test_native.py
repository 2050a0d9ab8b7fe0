"""Native C++ runtime tests: NumPy/native equivalence + Matrix Market I/O."""

import numpy as np
import pytest

from tpu_spmv import csr_from_dense, spmv_cpu_csr
from tpu_spmv import native
from tpu_spmv.io import load_matrix_market, save_matrix_market
from tpu_spmv.errors import InvalidFormatError, FileIOError


class TestCumcount:
    def test_matches_numpy(self, rng):
        for _ in range(20):
            n = rng.uniform_int(0, 5000)
            keys = rng.rng.integers(0, 97, n).astype(np.int64)
            got = native.cumcount(keys)
            # independent reference
            ref = np.zeros(n, np.int64)
            seen = {}
            for i, k in enumerate(keys):
                ref[i] = seen.get(int(k), 0)
                seen[int(k)] = ref[i] + 1
            np.testing.assert_array_equal(got, ref)


class TestNativeOracle:
    def test_matches_python_oracle(self, rng):
        if not native.available():
            pytest.skip("native library not built")
        for _ in range(10):
            dense = rng.dense_matrix(rng.uniform_int(1, 50),
                                     rng.uniform_int(1, 50), 0.3)
            csr = csr_from_dense(dense)
            x = rng.vector(csr.num_cols)
            y_native = spmv_cpu_csr(csr, x)
            # strict left-to-right fp32 accumulation, the reference's exact
            # order (spmv_cpu.cpp:6-16); native is built -ffp-contract=off
            # so it must match bitwise
            y_seq = np.zeros(csr.num_rows, np.float32)
            for i in range(csr.num_rows):
                s = np.float32(0.0)
                for j in range(csr.row_ptrs[i], csr.row_ptrs[i + 1]):
                    s = np.float32(
                        s + np.float32(csr.values[j] *
                                       x[csr.col_indices[j]]))
                y_seq[i] = s
            np.testing.assert_array_equal(y_native, y_seq)


class TestMatrixMarket:
    def test_roundtrip(self, rng, tmp_path):
        for i in range(10):
            dense = rng.dense_matrix(rng.uniform_int(1, 30),
                                     rng.uniform_int(1, 30), 0.3)
            csr = csr_from_dense(dense)
            path = str(tmp_path / f"m{i}.mtx")
            save_matrix_market(csr, path)
            back = load_matrix_market(path)
            assert back.num_rows == csr.num_rows
            assert back.num_cols == csr.num_cols
            np.testing.assert_allclose(back.to_dense(), dense, rtol=1e-6)

    def test_symmetric(self, tmp_path):
        path = str(tmp_path / "sym.mtx")
        with open(path, "w") as f:
            f.write("%%MatrixMarket matrix coordinate real symmetric\n")
            f.write("3 3 2\n")
            f.write("2 1 5.0\n")
            f.write("3 3 7.0\n")
        m = load_matrix_market(path)
        dense = m.to_dense()
        assert dense[1, 0] == 5.0 and dense[0, 1] == 5.0  # mirrored
        assert dense[2, 2] == 7.0
        assert m.nnz == 3

    def test_pattern(self, tmp_path):
        path = str(tmp_path / "pat.mtx")
        with open(path, "w") as f:
            f.write("%%MatrixMarket matrix coordinate pattern general\n")
            f.write("2 2 2\n")
            f.write("1 1\n")
            f.write("2 2\n")
        m = load_matrix_market(path)
        np.testing.assert_array_equal(m.to_dense(), np.eye(2, dtype=np.float32))

    def test_duplicates_summed(self, tmp_path):
        path = str(tmp_path / "dup.mtx")
        with open(path, "w") as f:
            f.write("%%MatrixMarket matrix coordinate real general\n")
            f.write("2 2 3\n")
            f.write("1 1 1.5\n")
            f.write("1 1 2.5\n")
            f.write("2 2 1.0\n")
        m = load_matrix_market(path)
        assert m.get_element(0, 0) == 4.0
        assert m.nnz == 2

    def test_bad_file(self, tmp_path):
        path = str(tmp_path / "bad.mtx")
        with open(path, "w") as f:
            f.write("not a matrix\n")
        with pytest.raises((InvalidFormatError, FileIOError)):
            load_matrix_market(path)

    def test_missing_file(self, tmp_path):
        with pytest.raises(FileIOError):
            load_matrix_market(str(tmp_path / "nope.mtx"))


def test_plan_native_numpy_equivalence(rng):
    """The native planner primitives must produce bit-identical plans to
    the NumPy fallbacks (the fallback is the spec)."""
    import importlib
    import os

    import numpy as np

    import tpu_spmv.native as native_mod

    if not native_mod.available():
        import pytest

        pytest.skip("native library not built")

    from tpu_spmv.kernels.window_ell import WindowEllPlan

    csr = rng.power_law_csr(5000, 3000, avg_nnz=10, alpha=1.6)
    # the content-aware lane balancer is a native-only optimization pass
    # (NumPy fallback skips it); disable it so the remaining primitives
    # can be compared bit-for-bit
    os.environ["TPU_SPMV_NO_BALANCE"] = "1"
    try:
        plan_native = WindowEllPlan.build(csr, split_rows=128)
        os.environ["TPU_SPMV_NO_NATIVE"] = "1"
        importlib.reload(native_mod)
        assert not native_mod.available()
        plan_numpy = WindowEllPlan.build(csr, split_rows=128)
    finally:
        os.environ.pop("TPU_SPMV_NO_NATIVE", None)
        os.environ.pop("TPU_SPMV_NO_BALANCE", None)
        importlib.reload(native_mod)
        assert native_mod.available()

    for a, b in zip(jax_leaves(plan_native), jax_leaves(plan_numpy)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def jax_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def test_plan_positions_native_matches_numpy():
    import numpy as np

    from tpu_spmv import native

    rng = np.random.default_rng(11)
    rows = 500
    row_len = rng.integers(0, 40, rows).astype(np.int64)
    row_ptrs = np.zeros(rows + 1, np.int32)
    row_ptrs[1:] = np.cumsum(row_len)
    parts = np.maximum(-(-row_len // 7), 1)
    ebor = np.zeros(rows, np.int64)
    np.cumsum((parts - 1)[:-1], out=ebor[1:])
    base = 4096
    got_pos, got_row = native.plan_positions(row_ptrs, parts, ebor, base)
    # NumPy reference (the fallback formulation)
    nnz = int(row_ptrs[-1])
    row_of = np.repeat(np.arange(rows, dtype=np.int64), row_len)
    in_row = np.arange(nnz, dtype=np.int64) - \
        np.repeat(row_ptrs[:-1].astype(np.int64), row_len)
    part = in_row % np.repeat(parts, row_len)
    want = np.where(part == 0, row_of, base + np.repeat(ebor, row_len)
                    + part - 1)
    np.testing.assert_array_equal(got_pos, want)
    np.testing.assert_array_equal(got_row, row_of)


def test_balance_row_tiles_valid_permutation():
    """balance_row_tiles assigns each 128-row tile's rows distinct lanes
    (a per-tile permutation), confines a partial final tile to
    [0, tile_len), and is deterministic."""
    import numpy as np

    from tpu_spmv import native

    if native._lib is None:
        import pytest

        pytest.skip("native library not built")
    rng = np.random.default_rng(3)
    rows = 128 * 5 + 41                       # partial final tile
    row_len = rng.integers(0, 30, rows).astype(np.int64)
    row_ptrs = np.zeros(rows + 1, np.int64)
    np.cumsum(row_len, out=row_ptrs[1:])
    n_wc = 64
    wc = rng.integers(0, n_wc, int(row_ptrs[-1])).astype(np.int64)
    parts = np.maximum(-(-row_len // 8), 1)
    lanes = native.balance_row_tiles(row_ptrs, wc, n_wc, sup_rows=256,
                                     parts=parts)
    assert lanes is not None and lanes.shape == (rows,)
    for t0 in range(0, rows, 128):
        tl = min(128, rows - t0)
        got = np.sort(lanes[t0:t0 + tl])
        np.testing.assert_array_equal(got, np.arange(tl))
    lanes2 = native.balance_row_tiles(row_ptrs, wc, n_wc, sup_rows=256,
                                      parts=parts)
    np.testing.assert_array_equal(lanes, lanes2)


def test_balance_row_tiles_levels_conflicting_rows():
    """Two deep rows stacking the same (chunk, lane) cell must end up on
    different lanes (the leveler's whole purpose)."""
    import numpy as np

    from tpu_spmv import native

    if native._lib is None:
        import pytest

        pytest.skip("native library not built")
    rows = 256
    # rows 0 and 128 are heavy in chunk 0 and share lane (r % 128 == 0);
    # every other row is empty
    row_len = np.zeros(rows, np.int64)
    row_len[0] = row_len[128] = 40
    row_ptrs = np.zeros(rows + 1, np.int64)
    np.cumsum(row_len, out=row_ptrs[1:])
    wc = np.zeros(80, np.int64)                # all nnz in chunk 0
    lanes = native.balance_row_tiles(row_ptrs, wc, 8, sup_rows=256,
                                     parts=None)
    assert lanes is not None
    assert lanes[0] != lanes[128]
