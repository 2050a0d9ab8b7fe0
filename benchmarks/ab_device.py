"""On-device A/B of planner lever settings on the headline matrix.

Builds the headline 10M-nnz power-law plan under several (spill_beta,
balance-window) settings, uploads each to the real TPU, verifies against
the CPU oracle, and times with the robust estimator.  The companion of
``sweep_caps.py`` (which reports slot accounting only): occupancy is a
proxy, this is the measurement.

Usage: python benchmarks/ab_device.py  (real TPU, ~5 min)
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
    from tpu_spmv.kernels.window_ell import WindowEllPlan, spmv_window_ell
    from tpu_spmv.timing import time_jitted
    from tpu_spmv.utils.testing import RandomGenerator, spmv_matches

    from tpu_spmv import native as _native

    _native.require()  # an A/B of planner levers is meaningless without
    # the native balancers — round 3 timed seven configs of which two
    # were bit-identical because the levers silently no-oped

    dev = jax.devices()[0]
    cpu0 = jax.local_devices(backend="cpu")[0]
    print(f"device: {dev.device_kind}", flush=True)
    rng = RandomGenerator(42)
    csr = rng.power_law_csr(262144, 4096, avg_nnz=40.0, alpha=1.6)
    x_h = rng.vector(4096)
    x = jnp.asarray(x_h)
    stream = measured_stream_bandwidth(dev)
    print(f"STREAM {stream:.0f} GB/s", flush=True)

    # (label, spill_beta, cap_slack, balance window, step width,
    #  balancer scoring mode — 0 reproduces the round-3 d^2 greedy,
    #  2 the atom-aware layer-cost greedy; see native.cc —
    #  and permute_rows: within-superblock row→lane leveling)
    configs = [
        ("legacy  beta=0   win=0    S=128", 0.0, 1, 0, 128, 0, False),
        ("r3      beta=2.6 win=1    S=128", 2.6, 1, 1, 128, 0, False),
        ("new     beta=2.2 sl0 w2L2 S=128", 2.2, 0, 2, 128, 2, False),
        ("perm    beta=2.2 sl0 w2L2 S=128", 2.2, 0, 2, 128, 2, True),
        ("perm    beta=2.2 sl0 w2L2 S=384", 2.2, 0, 2, 384, 2, True),
        ("new     beta=2.2 sl0 w2L2 S=384", 2.2, 0, 2, 384, 2, False),
        ("r3      beta=2.6 win=1    S=384", 2.6, 1, 1, 384, 0, False),
    ]
    seen_fps = {}
    for label, beta, slack, win, S, layer, perm in configs:
        os.environ["TPU_SPMV_BALANCE_WINDOW"] = str(win)
        os.environ["TPU_SPMV_BALANCE_LAYER"] = str(layer)
        try:
            t0 = time.time()
            ph = WindowEllPlan.build(csr, split_rows=128, step_groups=S,
                                     spill_beta=beta, cap_slack=slack,
                                     device=cpu0, permute_rows=perm)
            # lever-engagement assertions (VERDICT r03 weak #3): a row
            # whose lever did not change the plan is a measurement of
            # nothing — fail it loudly instead of timing a duplicate
            if perm and ph.lam is None:
                print(f"{label}: LEVER NO-OP — permute_rows requested but "
                      "lam is None; skipping", flush=True)
                continue
            fp = (int(ph.n_groups), round(float(ph.occupancy), 6),
                  int(ph.n_extra), ph.lam is not None, S)
            if fp in seen_fps:
                print(f"{label}: DUPLICATE PLAN of [{seen_fps[fp]}] "
                      f"(fingerprint {fp}); skipping", flush=True)
                continue
            seen_fps[fp] = label
            p = ph.to_device(dev)
            build_s = time.time() - t0
            y = np.asarray(spmv_window_ell(p, x))
            ok = spmv_matches(y, csr, x_h, rel_tol=1e-5)
            best = None
            for _ in range(3):
                s = time_jitted(spmv_window_ell, p, x, iters=300,
                                samples=5, estimator="median")
                act = p.n_groups * 1024 * (5.5 if p.sbn else 6.0) \
                    + (p.cols_pad + (p.e8 + p.out8) * 128) * 4 \
                    + (0 if p.lam is None else int(p.lam.size) * 12)
                if act / s / 1e9 <= stream * 1.02:
                    best = s
                    break
            print(f"{label}: groups={p.n_groups} occ={ph.occupancy:.4f} "
                  f"build={build_s:.0f}s ok={ok} "
                  f"t={'%.1f us' % (best * 1e6) if best else 'GUARD-FAIL'}",
                  flush=True)
        except Exception as e:  # one failing candidate must not kill
            # the A/B (e.g. a Mosaic lowering rejection on a new path)
            print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
