"""Per-region slot accounting for a headline plan (CPU-only diagnostic).

Reconstructs the (rows / level-1 extras / level-2 extras) regions from a
built plan's per-run superblock bases and reports groups, slots, placed
nonzeros and occupancy per region — the map for occupancy campaigns
(docs/PERF.md round-4 backlog levers 2/3).

Usage: python benchmarks/region_occ.py [--sup N] [--margin F] [--rows N]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, ".")
from tpu_spmv.kernels.window_ell import (  # noqa: E402
    CHUNKS, LANE, WindowEllPlan)
from tpu_spmv.utils.testing import RandomGenerator  # noqa: E402


def region_report(p: WindowEllPlan, label: str = "") -> dict:
    n_tb = p.sup // LANE
    base = np.asarray(p.base)            # per-scatter-run sup * n_tb
    sup_of_run = base // n_tb
    g_sup = np.repeat(sup_of_run, p.tb)
    vals = np.asarray(p.vals).reshape(-1, CHUNKS, LANE)
    placed = (vals != 0.0).reshape(len(g_sup), -1).sum(axis=1)
    extras_sup0 = p.extras_base // p.sup
    # level-2 section starts at lvl2_base (sup-aligned past the L1 extras)
    lvl2_sup0 = extras_sup0 + (-(-max(p.n_extra, 1) // p.sup))
    regions = {
        "rows": g_sup < extras_sup0,
        "extras_l1": (g_sup >= extras_sup0) & (g_sup < lvl2_sup0),
        "extras_l2": g_sup >= lvl2_sup0,
    }
    out = {}
    print(f"{label} groups={p.n_groups} occ={p.occupancy:.4f} "
          f"extras={p.n_extra} sup={p.sup} S={p.step_groups}")
    for name, m in regions.items():
        g = int(m.sum())
        nz = int(placed[m].sum())
        slots = g * CHUNKS * LANE
        occ = nz / slots if slots else 0.0
        # zero-value placed count misses explicit-zero nnz; fine for the
        # random generators used here
        print(f"  {name:10s} groups={g:6d} ({g/len(g_sup)*100:4.1f}%) "
              f"slots={slots/1e6:6.2f}M nnz={nz/1e6:6.3f}M occ={occ:.3f}")
        out[name] = {"groups": g, "nnz": nz, "occ": occ}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sup", type=int, default=None)
    ap.add_argument("--margin", type=float, default=0.3)
    ap.add_argument("--rows", type=int, default=262144)
    ap.add_argument("--cols", type=int, default=4096)
    ap.add_argument("--avg", type=float, default=40.0)
    ap.add_argument("--step-groups", type=int, default=128)
    ap.add_argument("--beta", type=float, default=None)
    args = ap.parse_args()
    rng = RandomGenerator(42)
    csr = rng.power_law_csr(args.rows, args.cols, avg_nnz=args.avg,
                            alpha=1.6)
    print(f"nnz={csr.nnz}", file=sys.stderr)
    t0 = time.time()
    p = WindowEllPlan.build(csr, split_rows=128,
                            step_groups=args.step_groups,
                            cap_margin=args.margin, sup=args.sup,
                            spill_beta=args.beta)
    region_report(p, f"[build {time.time()-t0:.0f}s]")


if __name__ == "__main__":
    main()
