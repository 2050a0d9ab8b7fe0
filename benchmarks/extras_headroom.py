"""How much extras-region occupancy is left on the table? (CPU-only)

For the headline plan, reconstructs the (superblock, window) buckets and
compares the achieved layer count ``lmax`` per bucket against two lower
bounds:

* ``lb_lane``  — max over chunks of ceil(nnz(bucket, chunk) / 128): the
  best any LANE assignment could do with the current extras→superblock
  assignment (chunks are content-fixed; lanes are the balancer's choice).
* ``lb_level`` — ceil(nnz(bucket) / 1024): perfect leveling across both
  chunks and lanes (unreachable — chunk is content-fixed — but bounds
  what cross-superblock moves could ever buy).

The gap Σ(lmax − lb) is the maximum group saving a better balancer could
realize; docs/PERF.md round-4 lever 2/3 sizing.

Usage: python benchmarks/extras_headroom.py [--rows N] [--win N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, ".")
from tpu_spmv.kernels.window_ell import (  # noqa: E402
    CHUNKS, LANE, WindowEllPlan)
from tpu_spmv.utils.testing import RandomGenerator  # noqa: E402


def headroom_report(p: WindowEllPlan) -> None:
    n_tb = p.sup // LANE
    base = np.asarray(p.base)
    g_sup = np.repeat(base // n_tb, p.tb)
    wg = np.asarray(p.wg)[: len(g_sup)]
    vals = np.asarray(p.vals).reshape(-1, CHUNKS, LANE)[: len(g_sup)]
    placed_cl = vals != 0.0                      # (groups, chunk, lane)
    extras_sup0 = p.extras_base // p.sup
    lvl2_sup0 = extras_sup0 + (-(-max(p.n_extra, 1) // p.sup))
    regions = {
        "rows": g_sup < extras_sup0,
        "extras_l1": (g_sup >= extras_sup0) & (g_sup < lvl2_sup0),
        "extras_l2": g_sup >= lvl2_sup0,
    }
    print(f"groups={p.n_groups} occ={p.occupancy:.4f} sup={p.sup}")
    for name, m in regions.items():
        if not m.any():
            continue
        bkey = g_sup[m].astype(np.int64) * (wg.max() + 1) + wg[m]
        ub, inv = np.unique(bkey, return_inverse=True)
        nb = len(ub)
        lmax = np.bincount(inv, minlength=nb)    # groups per bucket
        nnz_bc = np.zeros((nb, CHUNKS), np.int64)
        np.add.at(nnz_bc, inv, placed_cl[m].sum(axis=2))
        nnz_b = nnz_bc.sum(axis=1)
        lb_lane = np.maximum(-(-nnz_bc.max(axis=1) // 1),  # deepest chunk
                             0)
        # per chunk the 128 lanes level at ceil(chunk_nnz / 128)
        lb_lane = -(-nnz_bc // LANE).max(axis=1)
        lb_level = -(-nnz_b // (CHUNKS * LANE))
        g = int(lmax.sum())
        print(f"  {name:10s} buckets={nb:6d} groups={g:6d} "
              f"lb_lane={int(lb_lane.sum()):6d} "
              f"(save {g - int(lb_lane.sum()):5d}) "
              f"lb_level={int(lb_level.sum()):6d} "
              f"(save {g - int(lb_level.sum()):5d})")
        # depth histogram of the binding cells: how many buckets are
        # 1, 2, 3+ layers above their lane bound
        gap = lmax - lb_lane
        hist = np.bincount(np.minimum(gap, 5))
        print(f"    gap-over-lb_lane histogram (buckets): "
              f"{dict(enumerate(hist.tolist()))}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=262144)
    ap.add_argument("--cols", type=int, default=4096)
    ap.add_argument("--avg", type=float, default=40.0)
    ap.add_argument("--win", type=int, default=1)
    ap.add_argument("--layer", type=int, default=None,
                    help="TPU_SPMV_BALANCE_LAYER scoring mode (0/1/2)")
    ap.add_argument("--beta", type=float, default=None)
    args = ap.parse_args()
    os.environ["TPU_SPMV_BALANCE_WINDOW"] = str(args.win)
    if args.layer is not None:
        os.environ["TPU_SPMV_BALANCE_LAYER"] = str(args.layer)
    rng = RandomGenerator(42)
    csr = rng.power_law_csr(args.rows, args.cols, avg_nnz=args.avg,
                            alpha=1.6)
    print(f"nnz={csr.nnz} win={args.win} layer={args.layer}", flush=True)
    t0 = time.time()
    p = WindowEllPlan.build(csr, split_rows=128, step_groups=128,
                            spill_beta=args.beta)
    print(f"[build {time.time()-t0:.0f}s]")
    headroom_report(p)


if __name__ == "__main__":
    main()
