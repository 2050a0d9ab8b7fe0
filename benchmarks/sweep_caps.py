"""Definitive cap/balancer sweep on the headline plan (CPU, one process).

Sweeps spill_beta (order-statistic caps), cap_slack, and the extras
balancer mode (win=0: legacy per-block lanes, win>=1: slot balancer with
combine coupling) and prints per-region slot accounting for each.
"""

from __future__ import annotations

import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")
from benchmarks.region_occ import region_report  # noqa: E402
from tpu_spmv.kernels.window_ell import WindowEllPlan  # noqa: E402
from tpu_spmv.utils.testing import RandomGenerator  # noqa: E402


def main():
    rng = RandomGenerator(42)
    csr = rng.power_law_csr(262144, 4096, avg_nnz=40.0, alpha=1.6)
    print(f"nnz={csr.nnz}", flush=True)
    configs = []
    for win in (0, 1, 2):
        configs.append((None, 1, win))
    for beta in (2.6, 2.8, 3.0):
        for win in (0, 1, 2):
            configs.append((beta, 1, win))
    for beta in (2.8, 3.0):
        configs.append((beta, 0, 1))
    best = None
    for beta, slack, win in configs:
        os.environ["TPU_SPMV_BALANCE_WINDOW"] = str(win)
        t0 = time.time()
        p = WindowEllPlan.build(csr, split_rows=128, step_groups=128,
                                spill_beta=beta, cap_slack=slack)
        tag = f"beta={beta} slack={slack} win={win}"
        print(f"=== {tag} ({time.time()-t0:.0f}s) ===", flush=True)
        region_report(p)
        if best is None or p.n_groups < best[0]:
            best = (p.n_groups, tag)
        sys.stdout.flush()
    print("BEST:", best)


if __name__ == "__main__":
    main()
