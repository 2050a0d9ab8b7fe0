"""Differential soak: every dispatch path against the CPU oracle.

Runs randomized matrices from several structure classes through the
public entry points (all CSR kernel types, ELL, the sharded paths) and
checks the result against the golden oracle — the long-form version of
the suite's fuzz slice, for pre-release confidence runs.

Usage: python benchmarks/soak.py [--trials N] [--seed S] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_matrix(r, kind, rows, cols):
    import numpy as np

    from tpu_spmv.csr import CSRMatrix
    from tpu_spmv.utils.testing import RandomGenerator, web_graph_csr

    rng = RandomGenerator(int(r.integers(0, 2**31)))
    if kind == "uniform":
        k = int(r.integers(1, 32))
        ca = np.sort(r.integers(0, cols, (rows, k), dtype=np.int32), axis=1)
        va = r.random((rows, k)).astype(np.float32)
        rp = np.arange(rows + 1, dtype=np.int32) * k
        return CSRMatrix(rows, cols, va.reshape(-1), ca.reshape(-1), rp)
    if kind == "powerlaw":
        return rng.power_law_csr(rows, cols, avg_nnz=float(r.uniform(2, 40)),
                                 alpha=float(r.uniform(1.2, 2.5)))
    if kind == "web":
        return web_graph_csr(rng, rows, cols,
                             avg_nnz=float(r.uniform(4, 20)))
    if kind == "clustered":        # square planted-locality (round 5)
        from tpu_spmv.utils.testing import clustered_csr

        n = max(rows, 256)
        return clustered_csr(rng, n, n_clusters=int(r.integers(2, 17)),
                             avg_nnz=float(r.uniform(4, 16)))
    if kind == "scrambled":        # square scrambled-banded (round 5)
        from tpu_spmv.utils.testing import scrambled_banded_csr

        n = max(rows, 256)
        return scrambled_banded_csr(
            rng, n, bandwidth=int(r.integers(128, max(n // 2, 129))),
            avg_nnz=float(r.uniform(3, 12)))
    if kind == "banded":
        band = int(r.integers(1, 9))
        rr, cc, vv = [], [], []
        for d in range(-band, band + 1):
            i = np.arange(rows)
            j = (i * cols) // max(rows, 1) + d
            m = (j >= 0) & (j < cols)
            rr.append(i[m])
            cc.append(j[m])
            vv.append(r.random(int(m.sum())).astype(np.float32))
        rr, cc, vv = map(np.concatenate, (rr, cc, vv))
        o = np.lexsort((cc, rr))
        rp = np.zeros(rows + 1, np.int32)
        np.cumsum(np.bincount(rr, minlength=rows), out=rp[1:])
        return CSRMatrix(rows, cols, vv[o], cc[o].astype(np.int32), rp)
    # "hub": one dense row + one dense column + sparse background
    bg = rng.power_law_csr(rows, cols, avg_nnz=2.0)
    import numpy as np

    hub_r = int(r.integers(0, rows))
    hub_c = int(r.integers(0, cols))
    rr = np.concatenate([np.full(cols, hub_r), np.arange(rows),
                         np.repeat(np.arange(rows), np.diff(bg.row_ptrs))])
    cc = np.concatenate([np.arange(cols), np.full(rows, hub_c),
                         bg.col_indices]).astype(np.int64)
    vv = np.concatenate([r.random(cols), r.random(rows),
                         bg.values]).astype(np.float32)
    key, idx = np.unique(rr.astype(np.int64) * cols + cc,
                         return_index=True)
    rr2 = (key // cols).astype(np.int64)
    rp = np.zeros(rows + 1, np.int32)
    np.cumsum(np.bincount(rr2, minlength=rows), out=rp[1:])
    return CSRMatrix(rows, cols, vv[idx], (key % cols).astype(np.int32), rp)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--trials", type=int, default=60)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from tpu_spmv import KernelType, SpMVConfig, spmv_csr, spmv_ell
    from tpu_spmv.ell import ELLMatrix
    from tpu_spmv.utils.testing import spmv_matches

    r = np.random.default_rng(args.seed)
    kinds = ["uniform", "powerlaw", "web", "banded", "hub",
             "clustered", "scrambled"]
    t0 = time.time()
    fails = 0
    for trial in range(args.trials):
        kind = kinds[int(r.integers(0, len(kinds)))]
        rows = int(r.integers(1, 20000))
        cols = int(r.integers(1, 30000))
        csr = make_matrix(r, kind, rows, cols)
        rows, cols = csr.num_rows, csr.num_cols   # square kinds override
        x = r.uniform(-2, 2, cols).astype(np.float32)
        # half the trials run the packed paths with row→lane leveling
        # (the env default applies at plan-build; set it before the
        # first dispatch on this matrix so its plan cache is coherent)
        perm = bool(r.integers(0, 2))
        os.environ["TPU_SPMV_PERMUTE_ROWS"] = "1" if perm else "0"
        for kt in (KernelType.SCALAR_CSR, KernelType.VECTOR_CSR,
                   KernelType.MERGE_PATH):
            res = spmv_csr(csr, x, SpMVConfig(kernel_type=kt))
            ok = res.error_code == 0 and spmv_matches(
                np.asarray(res.y), csr, x, rel_tol=1e-4)
            if not ok:
                fails += 1
                print(f"FAIL trial={trial} kind={kind} {rows}x{cols} "
                      f"nnz={csr.nnz} kernel={kt.name} perm={perm} "
                      f"err={res.error_code}", flush=True)
        # the pattern fast path: a column-scaled twin of this structure
        # through SpMVConfig(pattern=True)
        from tpu_spmv.csr import CSRMatrix

        s = r.uniform(0.5, 2.0, cols).astype(np.float32)
        pat = CSRMatrix(rows, cols, s[csr.col_indices], csr.col_indices,
                        csr.row_ptrs)
        res = spmv_csr(pat, x, SpMVConfig(
            kernel_type=KernelType.MERGE_PATH, pattern=True))
        if not (res.error_code == 0 and spmv_matches(
                np.asarray(res.y), pat, x, rel_tol=1e-4)):
            fails += 1
            print(f"FAIL(pattern) trial={trial} kind={kind} "
                  f"{rows}x{cols} err={res.error_code}", flush=True)
        # bf16 value streams (round-4 lever): exactness bar is the
        # bf16 VALUE-rounding bound, not 1e-4 (tests/test_bf16_values)
        res = spmv_csr(csr, x, SpMVConfig(
            kernel_type=KernelType.MERGE_PATH, bf16_values=True))
        if not (res.error_code == 0 and spmv_matches(
                np.asarray(res.y), csr, x, rel_tol=8e-3)):
            fails += 1
            print(f"FAIL(bf16) trial={trial} kind={kind} "
                  f"{rows}x{cols} err={res.error_code}", flush=True)
        # structure-adaptive reordering (round-5 lever): forced on
        # square matrices that pass the structural gates — exercises
        # the permuted build + both Pallas chunk-gathers
        if rows == cols and rows >= 4096 and csr.nnz >= (1 << 16):
            res = spmv_csr(csr, x, SpMVConfig(
                kernel_type=KernelType.VECTOR_CSR, reorder=True))
            if not (res.error_code == 0 and spmv_matches(
                    np.asarray(res.y), csr, x, rel_tol=1e-4)):
                fails += 1
                print(f"FAIL(reorder) trial={trial} kind={kind} "
                      f"{rows}x{cols} err={res.error_code}", flush=True)
        if csr.nnz and csr.compute_stats().max_nnz_per_row <= 64 \
                and rows * csr.compute_stats().max_nnz_per_row < 2_000_000:
            ell = ELLMatrix.from_csr(csr)
            res = spmv_ell(ell, x)
            if not (res.error_code == 0 and spmv_matches(
                    np.asarray(res.y), csr, x, rel_tol=1e-4)):
                fails += 1
                print(f"FAIL(ELL) trial={trial} kind={kind} {rows}x{cols}",
                      flush=True)
        if trial % 10 == 9:
            print(f"  {trial + 1}/{args.trials} trials, {fails} failures, "
                  f"{time.time() - t0:.0f}s", flush=True)
    print(f"soak: {args.trials} trials x 4-5 paths, {fails} failures, "
          f"{time.time() - t0:.0f}s")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
