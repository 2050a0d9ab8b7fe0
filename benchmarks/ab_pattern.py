"""On-device A/B of PATTERN plans (implicit unit values, no f32 stream).

Measures, on the real TPU:
  1. the 10M-nnz headline STRUCTURE as natural vs pattern plans —
     quantifies what dropping 4 of the 5.5 streamed B/slot buys once the
     kernel stops being stream-bound (the compute floor emerges here);
  2. a 262K-node column-normalized transition matrix end-to-end through
     ``pagerank()`` — the consumer the pattern path exists for — against
     the generic packed path (``TPU_SPMV_NO_PATTERN=1`` disables the
     fast path for the baseline leg).

Usage: python benchmarks/ab_pattern.py  (real TPU, ~6 min)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    import jax
    import jax.numpy as jnp

    from tpu_spmv.bandwidth import measured_stream_bandwidth
    from tpu_spmv.csr import CSRMatrix
    from tpu_spmv.kernels.window_ell import WindowEllPlan, spmv_window_ell
    from tpu_spmv.timing import time_jitted
    from tpu_spmv.utils.testing import RandomGenerator, spmv_matches

    dev = jax.devices()[0]
    cpu0 = jax.local_devices(backend="cpu")[0]
    print(f"device: {dev.device_kind}", flush=True)
    stream = measured_stream_bandwidth(dev)
    print(f"STREAM {stream:.0f} GB/s", flush=True)

    # ---- leg 1: headline structure, natural vs pattern ----
    rng = RandomGenerator(42)
    csr = rng.power_law_csr(262144, 4096, avg_nnz=40.0, alpha=1.6)
    unit = CSRMatrix(csr.num_rows, csr.num_cols,
                     np.ones(csr.nnz, np.float32),
                     csr.col_indices, csr.row_ptrs)
    x_h = rng.vector(4096)
    x = jnp.asarray(x_h)
    for label, kw, oracle in (
            ("natural S=128", {}, csr),
            ("pattern S=128", {"pattern": True}, unit),
            ("pattern+perm S=128", {"pattern": True, "permute_rows": True},
             unit)):
        try:
            t0 = time.time()
            ph = WindowEllPlan.build(csr, split_rows=128, step_groups=128,
                                     device=cpu0, **kw)
            p = ph.to_device(dev)
            build_s = time.time() - t0
            ok = spmv_matches(np.asarray(spmv_window_ell(p, x)), oracle,
                              x_h, rel_tol=1e-5)
            best = None
            for _ in range(3):
                s = time_jitted(spmv_window_ell, p, x, iters=300,
                                samples=5, estimator="median")
                if p.stream_bytes / s / 1e9 <= stream * 1.02:
                    best = s
                    break
            print(f"{label}: groups={p.n_groups} "
                  f"stream={p.stream_bytes/1e6:.0f}MB build={build_s:.0f}s "
                  f"ok={ok} "
                  f"t={'%.1f us' % (best * 1e6) if best else 'GUARD-FAIL'}",
                  flush=True)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)

    # ---- leg 2: PageRank on a 262K column-normalized transition matrix
    # (pattern fast path vs generic packed path, wall clock per run) ----
    from tpu_spmv import pagerank
    from tpu_spmv.pagerank import PageRankConfig

    n = 262144
    g = np.random.default_rng(7)
    m = n * 14
    rows_a = g.integers(0, n, m)
    cols_a = g.integers(0, n, m)
    keep = rows_a != cols_a
    rows_a, cols_a = rows_a[keep], cols_a[keep]
    outdeg = np.bincount(cols_a, minlength=n)
    vals = (1.0 / np.maximum(outdeg, 1)[cols_a]).astype(np.float32)
    order = np.lexsort((cols_a, rows_a))
    ptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(rows_a, minlength=n), out=ptr[1:])
    A = CSRMatrix(n, n, vals[order], cols_a[order].astype(np.int32),
                  ptr.astype(np.int32))
    cfg = PageRankConfig(max_iterations=50)
    for label, env in (("pagerank generic", "1"), ("pagerank pattern", "")):
        try:
            if env:
                os.environ["TPU_SPMV_NO_PATTERN"] = env
            else:
                os.environ.pop("TPU_SPMV_NO_PATTERN", None)
            r = pagerank(A, cfg)          # compile + converge once
            t0 = time.time()
            r = pagerank(A, cfg)
            wall = time.time() - t0
            print(f"{label}: iters={r.iterations} conv={r.converged} "
                  f"res={r.final_residual:.2e} wall={wall*1e3:.0f} ms "
                  f"(~{wall/max(r.iterations,1)*1e3:.1f} ms/iter incl. "
                  f"host)", flush=True)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
