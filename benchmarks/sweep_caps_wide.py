"""Order-statistic cap sweep for the WIDE (web-graph) plan class (CPU).

The 1M-node web graph realizes occupancy 0.085 at sup=16384 against an
ideal-layer lower bound of 0.224 (docs/PERF.md bucket-density table) —
the gap is bucket-depth variance, exactly what the order-statistic
spill caps (spill_beta) attack.  Wide superblocks were left on the
legacy margin caps in round 3 because beta was unmeasured there; this
sweep measures the slot accounting.  Scatter cost at sup=16384 is
~0.55 ps/slot/target x 128 targets for ALL regions alike, so fewer
total groups converts directly to time.

Usage: python benchmarks/sweep_caps_wide.py [--rows N] [--full]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")
from benchmarks.region_occ import region_report  # noqa: E402
from tpu_spmv.kernels.window_ell import WindowEllPlan  # noqa: E402
from tpu_spmv.utils.testing import RandomGenerator, web_graph_csr  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=262144)
    ap.add_argument("--betas", type=str, default="0,1.5,2.6,4,6,10")
    ap.add_argument("--wins", type=str, default="1")
    ap.add_argument("--sups", type=str, default="auto")
    args = ap.parse_args()
    rng = RandomGenerator(42)
    csr = web_graph_csr(rng, args.rows, args.rows, avg_nnz=15)
    print(f"rows={csr.num_rows} nnz={csr.nnz}", flush=True)
    sups = [None] if args.sups == "auto" else \
        [int(s) for s in args.sups.split(",")]
    best = None
    for sup in sups:
        for beta in [float(b) for b in args.betas.split(",")]:
            for win in [int(w) for w in args.wins.split(",")]:
                os.environ["TPU_SPMV_BALANCE_WINDOW"] = str(win)
                t0 = time.time()
                try:
                    p = WindowEllPlan.build(csr, spill_beta=beta, sup=sup)
                except Exception as e:  # overflow at extreme betas
                    print(f"sup={sup} beta={beta} win={win}: "
                          f"{type(e).__name__} {e}", flush=True)
                    continue
                # measured scatter model (docs/PERF.md): ps/slot =
                # stream floor + 0.55/target beyond 8 targets
                targets = p.sup // 128
                ps = 8.3 + (0.29 if targets <= 8 else 0.55) * targets
                est_us = p.n_groups * 2048 * ps * 1e-6
                tag = (f"sup={p.sup} beta={beta} win={win} "
                       f"est={est_us:.0f}us")
                print(f"=== {tag} ({time.time()-t0:.0f}s) ===", flush=True)
                region_report(p)
                if best is None or est_us < best[0]:
                    best = (est_us, tag)
                sys.stdout.flush()
    print("BEST:", best)


if __name__ == "__main__":
    main()
