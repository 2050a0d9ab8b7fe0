"""Superblock-selector validation grid (round 5, VERDICT r04 weak #1).

The round-4 incident: the sampled analytic cost model over-priced the
narrow superblock ~4x on a skew-585 power-law matrix (it cannot see row
splitting or row->lane leveling) and flipped `_choose_sup` onto the wide
path, FAILING a driver perf artifact.  Round 5 adds measure-and-pick
(`window_ell._probe_groups`: sampled REAL builds settle ambiguous
choices) and this grid validates the whole selector across structure
classes: for each matrix, the ground truth is a FULL build at every
feasible superblock level (banded rescue included, mirroring
build_auto), scored at the measured per-slot rates; the selector's
choice must land within 10% of the best candidate's cost on >= 90% of
the grid.  CPU group accounting converts ~1:1 to bandwidth on the
HBM-roof kernel (docs/PERF.md), so the grid runs without a TPU; the
skew-585 reproduction is additionally device-checked by
benchmarks/perf_properties.py.

Usage: python benchmarks/model_grid.py [--out docs/MODEL_GRID_r05.json]
(~15-25 min, CPU-only)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_grid(rng):
    """(name, csr, split_rows) cases spanning the structure classes."""
    from tpu_spmv.utils.testing import (clustered_csr, scrambled_banded_csr,
                                        web_graph_csr)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from perf_properties import _uniform_csr, _varying_csr

    cases = []
    # the skew class (incl. the round-4 skew-585 failure shape):
    # power-law row lengths on narrow-ish columns, merge-path split
    for alpha in (1.2, 1.5, 2.0):
        for avg in (8, 32):
            m = rng.power_law_csr(131072, 4096, avg_nnz=float(avg),
                                  alpha=alpha)
            cases.append((f"power_law a={alpha} avg={avg}", m, 128))
    # dense-narrow (short-circuit band: mean bucket depth >= 2)
    cases.append(("uniform 131k x 4k avg=32",
                  _uniform_csr(rng, 131072, 4096, 32), 128))
    cases.append(("uniform 131k x 4k avg=128",
                  _uniform_csr(rng, 131072, 4096, 128), 128))
    cases.append(("varying 131k x 4k avg=32",
                  _varying_csr(rng, 131072, 4096, 32), None))
    # the wide class
    cases.append(("web_graph 65k", web_graph_csr(rng, 65536, 65536,
                                                 avg_nnz=12.0), None))
    cases.append(("web_graph 262k", web_graph_csr(rng, 262144, 262144,
                                                  avg_nnz=15.0), None))
    cases.append(("web_graph 262k sparse",
                  web_graph_csr(rng, 262144, 262144, avg_nnz=6.0), None))
    # locality classes (natural order — the selector must price the
    # scrambled structure it actually sees)
    cases.append(("clustered 262k", clustered_csr(rng, 262144,
                                                  n_clusters=32,
                                                  avg_nnz=14.0), None))
    cases.append(("banded-scrambled 262k",
                  scrambled_banded_csr(rng, 262144, bandwidth=4096,
                                       avg_nnz=12.0), None))
    # mid-depth band around the short-circuit threshold (depth ~1-4)
    cases.append(("uniform 131k x 16k avg=32",
                  _uniform_csr(rng, 131072, 16384, 32), 128))
    cases.append(("power_law 131k x 16k a=1.2 avg=16",
                  rng.power_law_csr(131072, 16384, avg_nnz=16.0,
                                    alpha=1.2), 128))
    return cases


def ground_truth(csr, split_rows):
    """Actual group count per feasible sup level via FULL builds
    (banded rescue mirrors build_auto's escalation)."""
    import tpu_spmv.kernels.window_ell as we

    out = {}
    for s in we.SUP_LEVELS:
        narrow = s == we.SUP_LEVELS[0]
        beta, slack = we._auto_caps(s)
        split = split_rows if narrow else None
        t0 = time.time()
        try:
            p = we.WindowEllPlan.build(
                csr, sup=s, split_rows=split, spill_beta=beta,
                cap_slack=slack, permute_rows=we._permute_default())
            groups = p.n_groups
        except we.WindowEllOverflow as e:
            nb = we._bands_from_overflow(e)
            if csr.num_rows <= s or nb < 2:
                out[s] = None
                continue
            try:
                bp = we.build_banded(
                    csr, sup=s, n_bands=nb, split_rows=split,
                    cap_slack=slack, spill_beta=beta,
                    permute_rows=we._permute_default())
                groups = bp.n_groups
            except we.WindowEllOverflow:
                out[s] = None
                continue
        out[s] = {"groups": int(groups),
                  "cost": groups * (we._STREAM_PS + we._SCATTER_PS[s]),
                  "build_s": round(time.time() - t0, 1)}
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/MODEL_GRID_r05.json")
    args = ap.parse_args()

    import tpu_spmv.kernels.window_ell as we
    from tpu_spmv.utils.testing import RandomGenerator

    rng = RandomGenerator(42)
    rows = []
    t_start = time.time()
    for name, csr, split in build_grid(rng):
        stats = csr.compute_stats()
        n_sups0 = -(-csr.num_rows // we.SUP_LEVELS[0])
        from tpu_spmv.csr import _bucket
        n_windows = _bucket(max(csr.num_cols, 1)) // we.WINDOW
        depth = csr.nnz / (n_sups0 * n_windows * 1024)
        t0 = time.time()
        pick = we._choose_sup(csr, split_rows=split)
        t_pick = time.time() - t0
        truth = ground_truth(csr, split)
        costs = {s: v["cost"] for s, v in truth.items() if v}
        best = min(costs, key=costs.get) if costs else None
        ok = (best is not None and pick in costs
              and costs[pick] <= 1.10 * costs[best])
        row = {
            "case": name, "rows": csr.num_rows, "cols": csr.num_cols,
            "nnz": csr.nnz, "skew": round(stats.skewness, 1),
            "depth": round(depth, 2), "split_rows": split,
            "model_pick": pick, "pick_s": round(t_pick, 1),
            "best": best, "within_10pct": bool(ok),
            "truth": {str(k): v for k, v in truth.items()},
        }
        rows.append(row)
        log(f"{name}: depth={depth:.2f} skew={stats.skewness:.0f} "
            f"pick={pick} best={best} ok={ok} "
            f"costs={ {k: round(v) for k, v in costs.items()} } "
            f"pick_time={t_pick:.1f}s")
    n_ok = sum(r["within_10pct"] for r in rows)
    report = {
        "criterion": "model choice cost <= 1.10 * best candidate cost "
                     "(actual full-build groups x measured per-slot rate)",
        "match_rate": round(n_ok / len(rows), 3),
        "target": 0.90,
        "passed": bool(n_ok / len(rows) >= 0.90),
        "n_cases": len(rows),
        "probe": {"ambig_narrow": we.PROBE_AMBIG_NARROW,
                  "ambig_wide": we.PROBE_AMBIG_WIDE,
                  "min_nnz": we.PROBE_MIN_NNZ,
                  "depth_gate": 0.5},
        "wall_s": round(time.time() - t_start, 1),
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    log(f"match rate {report['match_rate']} "
        f"({'PASS' if report['passed'] else 'FAIL'}) -> {args.out}")
    return 0 if report["passed"] else 1


if __name__ == "__main__":
    sys.exit(main())
