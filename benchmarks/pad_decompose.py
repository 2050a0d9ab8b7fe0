"""Decompose the headline plan's run-padding by region (CPU-only).

Sizes the round-5 swap-refinement lever (docs/PERF.md round-4 backlog
item 2): per superblock, the group run pads to a multiple of ``tb``;
an assignment whose per-superblock layer sums land on multiples of tb
pays zero padding.  This probe reports, per region (rows / extras_l1 /
extras_l2):

* real groups (sum of bucket maxes) vs streamed groups (after tb-run
  and S-section padding),
* pure-empty pad groups (all-zero vals — padding that absorbed no
  spill content),
* the per-superblock deficit histogram ``(-L[s]) % tb`` — the direct
  target of a cross-superblock swap refinement.

Usage: python benchmarks/pad_decompose.py [--rows N] [--step N]
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


def decompose(p: WindowEllPlan) -> None:
    n_tb = p.sup // LANE
    base = np.asarray(p.base)
    g_sup = np.repeat(base // n_tb, p.tb)
    vals = np.asarray(p.vals).reshape(-1, CHUNKS, LANE)[: len(g_sup)]
    empty = ~(vals != 0.0).any(axis=(1, 2))          # pure-empty groups
    extras_sup0 = p.extras_base // p.sup
    lvl2_sup0 = extras_sup0 + (-(-max(p.n_extra, 1) // p.sup))
    regions = {
        "extras_l1": (g_sup >= extras_sup0) & (g_sup < lvl2_sup0),
        "extras_l2": g_sup >= lvl2_sup0,
        "rows": g_sup < extras_sup0,
    }
    print(f"groups={p.n_groups} occ={p.occupancy:.4f} sup={p.sup} "
          f"tb={p.tb} S={p.step_groups} leveled={p.lam is not None}")
    tot_empty = 0
    for name, m in regions.items():
        if not m.any():
            continue
        n = int(m.sum())
        e = int(empty[m].sum())
        tot_empty += e
        # per-sup streamed group counts and their tb-deficits if the
        # empty pads were removed (the swap-refinement target)
        sups = g_sup[m]
        usup, cnt = np.unique(sups, return_counts=True)
        real = np.zeros(len(usup), np.int64)
        np.add.at(real, np.searchsorted(usup, sups[~empty[m]]), 1)
        deficit = (-real) % p.tb
        hist = np.bincount(deficit, minlength=p.tb)
        print(f"  {name:10s} streamed={n:6d} empty_pad={e:5d} "
              f"real={int(real.sum()):6d} sups={len(usup):4d}")
        print(f"    per-sup (-real)%tb histogram: {hist.tolist()} "
              f"(sum deficit={int(deficit.sum())})")
    print(f"total empty pad groups: {tot_empty} "
          f"({100.0 * tot_empty / p.n_groups:.1f}% of streamed)")




def eviction_cost(p: WindowEllPlan) -> None:
    """For extras_l1 buckets: how thin is each bucket's top layer?

    A cross-superblock layer transfer must relocate every cell at the
    bucket's max depth; ``count_at_max`` per bucket is the eviction
    cost lower bound.  Reports, per superblock, the m = L % tb residual
    and the cheapest m-bucket eviction (sum of the m smallest
    count_at_max values).
    """
    n_tb = p.sup // LANE
    base = np.asarray(p.base)
    g_sup = np.repeat(base // n_tb, p.tb)
    wg = np.asarray(p.wg)[: len(g_sup)]
    vals = np.asarray(p.vals).reshape(-1, CHUNKS, LANE)[: len(g_sup)]
    placed = vals != 0.0
    extras_sup0 = p.extras_base // p.sup
    lvl2_sup0 = extras_sup0 + (-(-max(p.n_extra, 1) // p.sup))
    m = (g_sup >= extras_sup0) & (g_sup < lvl2_sup0)
    empty = ~placed.any(axis=(1, 2))
    mm = m & ~empty
    bkey = g_sup[mm] * (int(wg.max()) + 1) + wg[mm]
    ub, inv = np.unique(bkey, return_inverse=True)
    nb = len(ub)
    # per-bucket per-cell depth
    depth = np.zeros((nb, CHUNKS, LANE), np.int64)
    np.add.at(depth, inv, placed[mm])
    lmax = np.bincount(inv, minlength=nb)
    cam = (depth == lmax[:, None, None]).sum(axis=(1, 2))
    print(f"extras_l1 buckets={nb}")
    print(f"  count_at_max percentiles: "
          f"{np.percentile(cam, [10, 25, 50, 75, 90]).astype(int).tolist()}")
    # per-sup cheapest m-layer eviction
    sup_of_b = ub // (int(wg.max()) + 1)
    usup = np.unique(sup_of_b)
    costs = []
    for s in usup:
        sel = sup_of_b == s
        L = int(lmax[sel].sum())
        r = L % p.tb
        if r == 0:
            continue
        c_sorted = np.sort(cam[sel])
        costs.append((r, int(c_sorted[:r].sum())))
    if costs:
        arr = np.array([c for _, c in costs])
        print(f"  sups needing eviction: {len(costs)}; "
              f"m-layer eviction cost percentiles "
          f"{np.percentile(arr, [10, 25, 50, 75, 90]).astype(int).tolist()}"
              f" total={int(arr.sum())}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=262144)
    ap.add_argument("--cols", type=int, default=4096)
    ap.add_argument("--avg", type=float, default=40.0)
    ap.add_argument("--step", type=int, default=256)
    ap.add_argument("--natural", action="store_true")
    args = ap.parse_args()
    rng = RandomGenerator(42)
    csr = rng.power_law_csr(args.rows, args.cols, avg_nnz=args.avg,
                            alpha=1.6)
    print(f"nnz={csr.nnz}", flush=True)
    t0 = time.time()
    p = WindowEllPlan.build(csr, split_rows=128, step_groups=args.step,
                            permute_rows=not args.natural)
    print(f"[build {time.time()-t0:.0f}s]")
    decompose(p)
    eviction_cost(p)


if __name__ == "__main__":
    main()
