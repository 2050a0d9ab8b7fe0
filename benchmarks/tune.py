"""Planner/selector tuning sweep (run on real TPU).

Re-derives the window-ELL plan parameters (split_rows, cap_margin) and the
selector thresholds empirically — the TPU analog of how the reference's
warp-tuned constants (``spmv_cpu.cpp:41-46``) were chosen.  Prints a table
of occupancy / extras / measured bandwidth per configuration and matrix
class.

Usage: python benchmarks/tune.py [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from tpu_spmv.kernels.window_ell import WindowEllPlan, spmv_window_ell
    from tpu_spmv.timing import time_jitted
    from tpu_spmv.utils.testing import RandomGenerator, web_graph_csr

    rng = RandomGenerator(42)
    scale = 4 if args.quick else 1

    matrices = {
        "powerlaw_unicol": rng.power_law_csr(65536 // scale, 4096,
                                             avg_nnz=24.0, alpha=1.6),
        "webgraph": web_graph_csr(rng, 65536 // scale, 65536 // scale,
                                  avg_nnz=24.0),
        "uniform_dense": rng.power_law_csr(32768 // scale, 1024,
                                           avg_nnz=64.0, alpha=8.0),
    }

    print(f"{'matrix':17s} {'split':>6s} {'margin':>6s} {'occ':>6s} "
          f"{'extras':>8s} {'groups':>8s} {'ms':>8s} {'modelGB/s':>9s} "
          f"{'slotGB/s':>9s}", flush=True)

    for name, csr in matrices.items():
        x = jnp.asarray(rng.vector(csr.num_cols))
        model_bytes = csr.nnz * 8 + (csr.num_rows + 1) * 4 \
            + csr.num_cols * 4 + csr.num_rows * 4
        for split in (None, 64, 128, 256):
            for margin in (0.15, 0.3, 0.5):
                try:
                    t0 = time.time()
                    plan = WindowEllPlan.build(csr, split_rows=split,
                                               cap_margin=margin)
                    secs = time_jitted(spmv_window_ell, plan, x, iters=300)
                    slots = plan.n_groups * 1024
                    print(f"{name:17s} {str(split):>6s} {margin:>6.2f} "
                          f"{plan.occupancy:6.3f} {plan.n_extra:8d} "
                          f"{plan.n_groups:8d} {secs*1e3:8.3f} "
                          f"{model_bytes/secs/1e9:9.1f} "
                          f"{slots*6/secs/1e9:9.1f}", flush=True)
                    for a in (plan.vals, plan.lo, plan.sb):
                        a.delete()
                except Exception as e:
                    print(f"{name:17s} {str(split):>6s} {margin:>6.2f} "
                          f"FAIL {type(e).__name__}: {str(e)[:80]}",
                          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
