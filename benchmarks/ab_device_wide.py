"""On-device A/B of wide-class (web-graph) planner configurations.

CPU slot accounting (benchmarks/sweep_caps_wide.py) says the sup=4096
mode needs ~2x fewer slot-cost units than sup=16384 on the 1M-node web
graph once row banding lifts the SMEM group cap (docs/PERF.md scatter
table: 32 targets at ~25 ps/slot vs 128 at ~43-80), and order-statistic
spill caps (spill_beta) with low slack cut groups a further 20-35%.
This measures the wall clock for each candidate against the round-3
dispatch baseline (single sup=16384 plan, margin caps).

Usage: python benchmarks/ab_device_wide.py [--rows N]  (real TPU,
~15 min at 1M rows: three plan builds + ~GB-scale uploads)
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
    ap.add_argument("--rows", type=int, default=1_000_000)
    args = ap.parse_args()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    import jax
    import jax.numpy as jnp

    from tpu_spmv.bandwidth import measured_stream_bandwidth
    from tpu_spmv.kernels.window_ell import (
        BandedPlan, WindowEllPlan, build_auto, build_banded, spmv_banded,
        spmv_window_ell)
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

    def build_cfg(label):
        if label == "r3-baseline sup=16384":
            p = WindowEllPlan.build(csr, sup=16384, cap_slack=2,
                                    device=cpu0)
            return spmv_window_ell, p
        if label == "build_auto natural":
            return build_auto(csr, device=cpu0, permute_rows=False)
        if label == "dispatch build_auto (leveled)":
            # round-4 dispatch defaults: permute_rows=None → True
            return build_auto(csr, device=cpu0)
        if label == "banded4096 beta=2.6 slack=1":
            return spmv_banded, build_banded(
                csr, sup=4096, spill_beta=2.6, cap_slack=1, device=cpu0)
        if label == "banded4096 beta=2.6 slack=0":
            return spmv_banded, build_banded(
                csr, sup=4096, spill_beta=2.6, cap_slack=0, device=cpu0)
        raise ValueError(label)

    # (label, balance window, balancer scoring mode): the r3 candidates
    # reproduce the round-3 d^2 greedy (win=1, mode 0); "dispatch
    # build_auto" runs the current defaults (win=2, atom-aware mode 2)
    for label, win, layer in (
            ("r3-baseline sup=16384", 1, 0),
            ("build_auto natural", 2, 2),
            ("dispatch build_auto (leveled)", 2, 2),
            ("banded4096 beta=2.6 slack=0", 1, 0),
            ("banded4096 beta=2.6 slack=1", 1, 0)):
        os.environ["TPU_SPMV_BALANCE_WINDOW"] = str(win)
        os.environ["TPU_SPMV_BALANCE_LAYER"] = str(layer)
        t0 = time.time()
        try:
            fn, ph = build_cfg(label)
        except Exception as e:
            print(f"{label}: build failed {type(e).__name__} {e}",
                  flush=True)
            continue
        try:
            p = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(ph),
                [jax.device_put(np.asarray(a), dev)
                 for a in jax.tree_util.tree_leaves(ph)])
            build_s = time.time() - t0
            y = np.asarray(fn(p, x))
            ok = spmv_matches(y, csr, x_h, rel_tol=1e-5)
            s = time_jitted(fn, p, x, iters=60, samples=5,
                            estimator="median")
            n_plans = len(getattr(ph, "plans", (1,)))
            print(f"{label}: kind={type(ph).__name__}/{n_plans} "
                  f"sup={ph.sup} groups={ph.n_groups} "
                  f"occ={ph.occupancy:.4f} build={build_s:.0f}s ok={ok} "
                  f"t={s*1e3:.2f} ms = {bm/s/1e9:.2f} GB/s", flush=True)
        except Exception as e:  # one failing candidate must not kill
            # the A/B (e.g. a Mosaic lowering rejection on a new path)
            print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
