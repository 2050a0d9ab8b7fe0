"""Planner-parameter sweep on slot counts (CPU-only, round 3).

The headline kernel is HBM-roof-bound, so streamed bytes predict time:
bytes = groups * 1024 * (5.5 if sbn else 6).  This sweeps the planner
knobs and reports predicted headline time at the measured effective
stream rate (~720 GB/s on v5e).

Usage: python benchmarks/sweep_plan.py
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, ".")
from tpu_spmv.kernels.window_ell import WindowEllPlan  # noqa: E402
from tpu_spmv.utils.testing import RandomGenerator  # noqa: E402

RATE = 720e9  # measured effective stream rate, v5e


def main():
    rng = RandomGenerator(42)
    csr = rng.power_law_csr(262144, 4096, avg_nnz=40.0, alpha=1.6)
    print(f"nnz={csr.nnz}", file=sys.stderr)
    best = None
    for split in (64, 128, 192, 256):
        for margin in (0.15, 0.3, 0.45):
            for slack in (0, 1):
                t0 = time.time()
                try:
                    p = WindowEllPlan.build(
                        csr, split_rows=split, step_groups=256,
                        cap_margin=margin, cap_slack=slack)
                except Exception as e:
                    print(f"split={split} margin={margin} slack={slack} "
                          f"FAIL {e}")
                    continue
                bps = 5.5 if p.sbn else 6.0
                us = p.n_groups * 1024 * bps / RATE * 1e6
                print(f"split={split:3d} margin={margin:.2f} slack={slack} "
                      f"groups={p.n_groups:6d} occ={p.occupancy:.4f} "
                      f"extras={p.n_extra:6d} -> ~{us:5.1f} us "
                      f"({time.time()-t0:.0f}s)")
                if best is None or p.n_groups < best[0]:
                    best = (p.n_groups, split, margin, slack)
    print("best:", best)


if __name__ == "__main__":
    main()
