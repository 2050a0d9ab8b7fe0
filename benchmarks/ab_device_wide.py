"""On-device A/B of wide-class (web-graph) planner lever settings.

CPU slot accounting (benchmarks/sweep_caps_wide.py) says order-statistic
spill caps at cap_slack<=1 cut wide-plan groups 20-35% on web graphs —
this measures whether the scatter-bound wall clock follows.  Configs
span the legacy default (slack=2, margin caps) and the beta-cap
candidates at sup=4096.

Usage: python benchmarks/ab_device_wide.py [--rows N]  (real TPU)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=262144)
    args = ap.parse_args()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    import jax
    import jax.numpy as jnp

    from tpu_spmv.bandwidth import measured_stream_bandwidth
    from tpu_spmv.kernels.window_ell import WindowEllPlan, spmv_window_ell
    from tpu_spmv.timing import time_jitted
    from tpu_spmv.utils.testing import (RandomGenerator, spmv_matches,
                                        web_graph_csr)

    dev = jax.devices()[0]
    cpu0 = jax.local_devices(backend="cpu")[0]
    print(f"device: {dev.device_kind} rows={args.rows}", flush=True)
    rng = RandomGenerator(42)
    csr = web_graph_csr(rng, args.rows, args.rows, avg_nnz=15)
    print(f"nnz={csr.nnz}", flush=True)
    x_h = rng.vector(args.rows)
    x = jnp.asarray(np.asarray(x_h))
    stream = measured_stream_bandwidth(dev)
    print(f"STREAM {stream:.0f} GB/s", flush=True)

    # byte model (reference convention) for GB/s reporting
    bm = (csr.nnz * 8 + (csr.num_rows + 1) * 4 + csr.num_cols * 4
          + csr.num_rows * 4)

    configs = [
        ("legacy auto (slack=2, margin)", None, 0.0, 2, 0),
        ("beta=2.6 slack=1 win=1", 4096, None, 1, 1),
        ("beta=2.6 slack=0 win=1", 4096, 2.6, 0, 1),
        ("beta=2.6 slack=0 sup=16384", 16384, 2.6, 0, 1),
    ]
    for label, sup, beta, slack, win in configs:
        os.environ["TPU_SPMV_BALANCE_WINDOW"] = str(win)
        t0 = time.time()
        try:
            ph = WindowEllPlan.build(csr, spill_beta=beta, sup=sup,
                                     cap_slack=slack, device=cpu0)
        except Exception as e:
            print(f"{label}: build failed {type(e).__name__} {e}",
                  flush=True)
            continue
        leaves, aux = ph.tree_flatten()
        p = WindowEllPlan.tree_unflatten(
            aux, tuple(jax.device_put(np.asarray(a), dev) for a in leaves))
        build_s = time.time() - t0
        y = np.asarray(spmv_window_ell(p, x))
        ok = spmv_matches(y, csr, x_h, rel_tol=1e-5)
        s = time_jitted(spmv_window_ell, p, x, iters=100,
                        samples=5, estimator="median")
        print(f"{label}: sup={p.sup} groups={p.n_groups} "
              f"occ={ph.occupancy:.4f} build={build_s:.0f}s ok={ok} "
              f"t={s*1e3:.2f} ms = {bm/s/1e9:.2f} GB/s", flush=True)


if __name__ == "__main__":
    main()
