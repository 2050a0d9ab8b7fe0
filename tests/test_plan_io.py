"""Plan serialization round-trip (round-3: VERDICT r02 next-step #5).

The plan is the expensive artifact (5-20 s planner at the 10M-nnz
capacity target vs a ~200 µs kernel); save/load must reproduce the exact
leaves and static aux so a loaded plan hits the same jit cache entry and
computes identical results.
"""

import numpy as np
import pytest

from tpu_spmv import load_plan, save_plan
from tpu_spmv.csr import CSRMatrix
from tpu_spmv.errors import InvalidFormatError
from tpu_spmv.kernels.window_ell import (CompositePlan, WindowEllPlan,
                                         build_composite, spmv_composite,
                                         spmv_window_ell)
from tpu_spmv.utils.testing import spmv_matches


def _power_law(rng, rows, cols, avg):
    return rng.power_law_csr(rows, cols, avg_nnz=avg, alpha=1.6)


def test_window_plan_roundtrip(tmp_path, rng):
    csr = _power_law(rng, 4096, 2048, 12.0)
    plan = WindowEllPlan.build(csr, split_rows=128)
    path = str(tmp_path / "plan.npz")
    plan.save(path)
    loaded = WindowEllPlan.load(path)

    # static aux identical -> same jit cache key
    _, aux0 = plan.tree_flatten()
    _, aux1 = loaded.tree_flatten()
    assert aux0 == aux1
    assert loaded.occupancy == pytest.approx(plan.occupancy)
    for a, b in zip(plan.tree_flatten()[0], loaded.tree_flatten()[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    x = rng.vector(2048)
    y = np.asarray(spmv_window_ell(loaded, x))
    assert spmv_matches(y, csr, x, rel_tol=1e-5)


def test_composite_plan_roundtrip(tmp_path, rng):
    # wide sparse structure so the composite path engages (hub columns)
    r = rng.rng
    rows = cols = 6000
    nr = 8000
    rr = r.integers(0, rows, nr).astype(np.int64)
    cc = np.minimum((r.pareto(1.2, nr) * 30).astype(np.int64), cols - 1)
    m = np.zeros((rows, cols), np.float32)
    m[rr, cc] = r.uniform(-2, 2, nr).astype(np.float32)
    csr = CSRMatrix.from_dense(m)
    cp = build_composite(csr)
    path = str(tmp_path / "cp.npz")
    cp.save(path)
    loaded = CompositePlan.load(path)
    assert len(loaded.plans) == len(cp.plans)
    assert (loaded.tail is None) == (cp.tail is None)
    x = rng.vector(cols)
    y = np.asarray(spmv_composite(loaded, x))
    assert spmv_matches(y, csr, x, rel_tol=1e-5)


def test_load_kind_mismatch(tmp_path, rng):
    csr = _power_law(rng, 1024, 1024, 6.0)
    plan = WindowEllPlan.build(csr)
    path = str(tmp_path / "p.npz")
    plan.save(path)
    with pytest.raises(InvalidFormatError):
        CompositePlan.load(path)
    # generic loader serves either kind
    generic = load_plan(path)
    assert isinstance(generic, WindowEllPlan)


def test_load_rejects_non_plan(tmp_path):
    path = str(tmp_path / "junk.npz")
    np.savez(path, a=np.zeros(3))
    with pytest.raises(InvalidFormatError):
        load_plan(path)


def test_save_rejects_unknown_type(tmp_path):
    with pytest.raises(InvalidFormatError):
        save_plan(object(), str(tmp_path / "x.npz"))


def test_load_rejects_corrupt_file(tmp_path):
    """Corrupt / non-npz content must surface through the library's
    error taxonomy (InvalidFormatError), not raw numpy/zipfile errors."""
    path = str(tmp_path / "corrupt.npz")
    with open(path, "w") as f:
        f.write("this is not an npz archive")
    with pytest.raises(InvalidFormatError):
        load_plan(path)


def test_load_missing_file(tmp_path):
    from tpu_spmv.errors import FileIOError

    with pytest.raises(FileIOError):
        load_plan(str(tmp_path / "missing.npz"))


def test_banded_plan_roundtrip(tmp_path, rng):
    from tpu_spmv.kernels.window_ell import (BandedPlan, build_banded,
                                             spmv_banded)
    from tpu_spmv.utils.testing import web_graph_csr

    csr = web_graph_csr(rng, 6000, 2100, avg_nnz=9)
    bp = build_banded(csr, sup=1024, n_bands=3, spill_beta=2.6)
    path = str(tmp_path / "banded.npz")
    bp.save(path)
    loaded = BandedPlan.load(path)
    assert isinstance(loaded, BandedPlan)
    assert len(loaded.plans) == len(bp.plans)
    assert (loaded.num_rows, loaded.num_cols) == (bp.num_rows, bp.num_cols)
    for p0, p1 in zip(bp.plans, loaded.plans):
        _, a0 = p0.tree_flatten()
        _, a1 = p1.tree_flatten()
        assert a0 == a1
        for a, b in zip(p0.tree_flatten()[0], p1.tree_flatten()[0]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    x = rng.vector(2100)
    y = np.asarray(spmv_banded(loaded, x))
    assert spmv_matches(y, csr, x, rel_tol=1e-5)


def test_banded_load_rejects_other_plan_kinds(tmp_path, rng):
    """BandedPlan.load mirrors WindowEllPlan.load's kind check
    (InvalidFormatError, not a silently wrong return type)."""
    from tpu_spmv.kernels.window_ell import BandedPlan

    csr = _power_law(rng, 512, 256, 6.0)
    p = WindowEllPlan.build(csr)
    path = str(tmp_path / "single.npz")
    p.save(path)
    with pytest.raises(InvalidFormatError):
        BandedPlan.load(path)


def test_permuted_plan_roundtrip(tmp_path, rng):
    """A permute_rows plan's lam leaf survives save/load and the loaded
    plan still restores natural row order."""
    import numpy as np

    from tpu_spmv.kernels.window_ell import WindowEllPlan, spmv_window_ell
    from tpu_spmv.utils.testing import spmv_matches

    csr = rng.power_law_csr(1500, 900, avg_nnz=10.0, alpha=1.6)
    plan = WindowEllPlan.build(csr, split_rows=128, permute_rows=True)
    assert plan.lam is not None
    path = str(tmp_path / "perm.npz")
    plan.save(path)
    loaded = WindowEllPlan.load(path)
    assert loaded.lam is not None
    np.testing.assert_array_equal(np.asarray(loaded.lam),
                                  np.asarray(plan.lam))
    x = rng.vector(900)
    y = np.asarray(spmv_window_ell(loaded, x))
    assert spmv_matches(y, csr, x, rel_tol=1e-5)


def test_pattern_plan_roundtrip(tmp_path, rng):
    """Pattern plans persist without a vals entry and load back as
    pattern plans; a file stripped of vals without the pat flag is
    rejected."""
    import numpy as np

    from tpu_spmv.errors import InvalidFormatError
    from tpu_spmv.kernels.window_ell import WindowEllPlan, spmv_window_ell
    from tpu_spmv.utils.testing import spmv_matches
    from tpu_spmv.csr import CSRMatrix

    csr = rng.power_law_csr(1200, 800, avg_nnz=9.0, alpha=1.6)
    plan = WindowEllPlan.build(csr, split_rows=128, pattern=True)
    path = str(tmp_path / "pat.npz")
    plan.save(path)
    loaded = WindowEllPlan.load(path)
    assert loaded.pat and loaded.vals is None
    unit = CSRMatrix(csr.num_rows, csr.num_cols,
                     np.ones(csr.nnz, np.float32),
                     csr.col_indices, csr.row_ptrs)
    x = rng.vector(800)
    assert spmv_matches(np.asarray(spmv_window_ell(loaded, x)), unit, x,
                        rel_tol=1e-5)


def test_t_base_roundtrip_and_legacy_default(tmp_path, rng):
    """The scatter-run length (tb, round 4) survives save/load; plan
    files written before the field existed load with the default run
    length (the aux dict merges as keyword arguments)."""
    import json

    import numpy as np

    from tpu_spmv.kernels.window_ell import (T_BASE, WindowEllPlan,
                                             spmv_window_ell)
    from tpu_spmv.utils.testing import spmv_matches

    csr = rng.power_law_csr(1500, 900, avg_nnz=10.0, alpha=1.6)
    plan = WindowEllPlan.build(csr, split_rows=128, t_base=4)
    assert plan.tb == 4
    path = str(tmp_path / "tb4.npz")
    plan.save(path)
    loaded = WindowEllPlan.load(path)
    assert loaded.tb == 4
    x = rng.vector(900)
    assert spmv_matches(np.asarray(spmv_window_ell(loaded, x)), csr, x,
                        rel_tol=1e-5)

    # simulate a pre-round-4 file: strip "tb" from the aux metadata
    with np.load(path, allow_pickle=False) as z:
        arrays = {n: z[n] for n in z.files}
    meta = json.loads(bytes(arrays["__meta__"].tobytes()).decode())
    del meta["p_aux"]["tb"]
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    legacy = str(tmp_path / "legacy.npz")
    with open(legacy, "wb") as f:
        np.savez(f, **arrays)
    old = WindowEllPlan.load(legacy)
    assert old.tb == T_BASE   # layout default — the file predates the field
