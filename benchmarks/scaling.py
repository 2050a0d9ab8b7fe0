"""Multi-chip scaling benchmark — nnz/s efficiency vs device count.

Measures the north-star scaling target (BASELINE.md: ≥70% nnz/s efficiency
1 → 4 hosts on power-law graphs) by running the row-sharded SpMV over
1, 2, 4, … device meshes and reporting parallel efficiency.

On real multi-chip hardware this measures ICI-scale behavior; on a single
chip it degenerates to the 1-device row; forced-CPU runs
(``python benchmarks/scaling.py --cpu-devices 8``) validate the sharded
path functionally (CPU timings are not a perf surface).

Usage: python benchmarks/scaling.py [--rows N] [--avg-nnz K] [--cpu-devices N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=262144)
    p.add_argument("--cols", type=int, default=None)
    p.add_argument("--avg-nnz", type=float, default=16.0)
    p.add_argument("--structure", choices=("powerlaw", "local"),
                   default="powerlaw",
                   help="'local': banded row-locality structure (the "
                        "graph class where the ring path's footprint "
                        "compression wins; iid power-law columns touch "
                        "all of x, so compression is 1 by construction)")
    p.add_argument("--cpu-devices", type=int, default=0,
                   help="force an N-device virtual CPU mesh (functional)")
    p.add_argument("--json", action="store_true")
    p.add_argument("--out", type=str, default=None,
                   help="also write the JSON rows to this file")
    args = p.parse_args(argv)

    import jax

    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)
    import numpy as np

    from tpu_spmv.kernels.window_ell import WindowEllOverflow
    from tpu_spmv.parallel import (make_row_mesh, ring_traffic_report,
                                   shard_csr, shard_csr_packed,
                                   shard_csr_ring, spmv_csr_ring,
                                   spmv_csr_sharded,
                                   spmv_csr_sharded_packed)
    from tpu_spmv.timing import time_jitted
    from tpu_spmv.utils.testing import RandomGenerator, spmv_matches

    n_dev = len(jax.devices())
    is_cpu_mesh = jax.devices()[0].platform == "cpu"
    cols = args.cols or min(args.rows, 4096)
    rng = RandomGenerator(42)
    if args.structure == "local":
        # banded locality: each row's columns within ±2% of the diagonal
        # (the partition-friendly graph class — meshes, road networks);
        # per-shard x footprints then shrink with the shard count and the
        # ring path's byte model beats replication
        import numpy as _np

        half = max(64, int(cols * 0.02))
        k = max(1, int(args.avg_nnz))
        base_r = _np.repeat(_np.arange(args.rows, dtype=_np.int64), k)
        off = rng.rng.integers(-half, half + 1, size=len(base_r))
        cc = _np.clip((base_r * cols) // args.rows + off, 0, cols - 1)
        order = _np.lexsort((cc, base_r))
        from tpu_spmv.csr import CSRMatrix

        rp = _np.zeros(args.rows + 1, _np.int32)
        _np.cumsum(_np.bincount(base_r, minlength=args.rows), out=rp[1:])
        csr = CSRMatrix(args.rows, cols,
                        rng.vector(len(base_r)).astype(_np.float32),
                        cc[order].astype(_np.int32), rp)
    else:
        csr = rng.power_law_csr(args.rows, cols, avg_nnz=args.avg_nnz,
                                alpha=1.6)
    x = rng.vector(cols)
    print(f"devices: {n_dev} x {jax.devices()[0].device_kind}; "
          f"matrix {args.rows}x{cols} nnz={csr.nnz}", file=sys.stderr)

    counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    base = None
    rows_out = []
    for d in counts:
        mesh = make_row_mesh(d)
        try:
            sharded = shard_csr_packed(csr, mesh)
            run = spmv_csr_sharded_packed
        except WindowEllOverflow:
            sharded = shard_csr(csr, mesh)
            run = spmv_csr_sharded
        y = np.asarray(run(sharded, x, mesh))
        ok = spmv_matches(y, csr, x, rel_tol=1e-5)
        secs = time_jitted(lambda sh, xv: run(sh, xv, mesh),
                           sharded, x, iters=100)
        nnz_s = csr.nnz / secs
        if base is None:
            base = nnz_s
        # wall-clock efficiency is a REAL-HARDWARE number: the virtual
        # CPU mesh serializes shard execution in one process, so its
        # wall ratios are scheduler noise, not scaling signal (VERDICT
        # r03 weak #6) — recorded as None there; efficiency_balance is
        # the CPU-mesh signal
        eff = None if is_cpu_mesh else nnz_s / (base * d)
        imb = sharded.nnz_imbalance
        # work-balance efficiency: mean/max per-shard nnz — the upper
        # bound a step-synchronized mesh can reach, and the number the
        # nnz-balanced partitioner controls.  Wall-clock efficiency on
        # the VIRTUAL CPU mesh under-reads badly because the single-
        # process CPU backend serializes shard execution; on real
        # multi-chip ICI the wall-clock column is the one that counts.
        balance = 1.0 / (1.0 + imb)
        # ring path (round 3): x row-sharded, packed footprint slices
        # ppermuted; report the ICI/DCN byte model next to correctness
        try:
            rs = shard_csr_ring(csr, mesh)
            yr = np.asarray(spmv_csr_ring(rs, x, mesh))
            ring_ok = spmv_matches(yr, csr, x, rel_tol=1e-5)
            traffic = ring_traffic_report(rs)
        except WindowEllOverflow:
            ring_ok, traffic = None, None
        # round-3 planner levers over the same mesh: row→lane leveled
        # shard plans, and a pattern sharding (no f32 vals stream) of a
        # column-scaled twin of this structure
        try:
            sl = shard_csr_packed(csr, mesh, permute_rows=True)
            lv_ok = bool(spmv_matches(
                np.asarray(spmv_csr_sharded_packed(sl, x, mesh)),
                csr, x, rel_tol=1e-5))
        except WindowEllOverflow:
            lv_ok = None
        try:
            from tpu_spmv.csr import CSRMatrix

            s_col = np.abs(rng.vector(cols)) + 0.5
            twin = CSRMatrix(csr.num_rows, cols,
                             s_col[csr.col_indices], csr.col_indices,
                             csr.row_ptrs)
            st = shard_csr_packed(twin, mesh, pattern=True)
            pt_ok = bool(spmv_matches(
                np.asarray(spmv_csr_sharded_packed(st, x, mesh)),
                twin, x, rel_tol=1e-5))
        except WindowEllOverflow:
            pt_ok = None
        rows_out.append({"devices": d, "gnnz_per_s": nnz_s / 1e9,
                         "efficiency_wall": eff,
                         "efficiency_balance": balance,
                         "nnz_imbalance": imb,
                         "correct": bool(ok),
                         "ring_correct": ring_ok,
                         "leveled_correct": lv_ok,
                         "pattern_correct": pt_ok,
                         "ring_traffic": traffic})
        comp = "n/a" if not traffic else \
            f"{traffic['compression']:.2f}x compression"
        eff_s = "  n/a" if eff is None else f"{eff:5.2f}"
        print(f"  {d:2d} dev: {secs*1e6:9.1f} us  {nnz_s/1e9:7.2f} Gnnz/s  "
              f"eff(wall) {eff_s}  eff(balance) {balance:5.2f}  "
              f"imbalance {imb:5.1%}  correct={ok}  ring={ring_ok} "
              f"({comp})  leveled={lv_ok}  pattern={pt_ok}",
              file=sys.stderr)
    if args.json:
        print(json.dumps(rows_out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"platform": jax.devices()[0].device_kind,
                       "rows": args.rows, "nnz": csr.nnz,
                       "structure": args.structure,
                       "results": rows_out}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
