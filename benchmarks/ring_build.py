"""Ring-sharding build-cost scaling (round 5, VERDICT r04 weak #3 / #6).

The ring form builds n*(n-1) block-pair plans and pads ``pack_idx`` to
the max packed footprint across sources — quadratic in the mesh size.
This measures the curve (build wall, stacked plan bytes, footprint
padding) at n = 4/8/16/32 on the virtual CPU mesh, numerically checks
the n=16 and n=32 results against the CPU oracle, and records the
artifact the `_ring_max_shards` cap policy cites.

Runs in its own process: it needs up to 32 virtual devices, while the
test suite's conftest pins 8.

Usage: python benchmarks/ring_build.py [--out docs/RING_BUILD_r05.json]
(CPU-only, ~10-20 min at the 131K default)
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/RING_BUILD_r05.json")
    ap.add_argument("--rows", type=int, default=131072)
    ap.add_argument("--sizes", type=int, nargs="*", default=[4, 8, 16, 32])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", max(args.sizes))
    import jax.numpy as jnp

    os.environ["TPU_SPMV_RING_MAX"] = str(max(args.sizes))  # lift the cap
    from tpu_spmv.parallel import make_row_mesh, shard_csr_ring
    from tpu_spmv.parallel.distributed import (ring_traffic_report,
                                               spmv_csr_ring)
    from tpu_spmv.utils.testing import RandomGenerator, spmv_matches

    rng = RandomGenerator(42)
    from tpu_spmv.utils.testing import web_graph_csr

    csr = web_graph_csr(rng, args.rows, args.rows, avg_nnz=12.0)
    x_h = rng.vector(args.rows)
    x = jnp.asarray(np.asarray(x_h))
    log(f"matrix: {args.rows}^2 nnz={csr.nnz}")

    rows = []
    for n in args.sizes:
        mesh = make_row_mesh(n)
        t0 = time.time()
        try:
            rs = shard_csr_ring(csr, mesh)
        except Exception as e:
            rows.append({"n": n, "error": f"{type(e).__name__}: {e}"})
            log(f"n={n}: build failed {e}")
            continue
        build_s = time.time() - t0
        leaf_bytes = sum(
            int(np.prod(a.shape)) * a.dtype.itemsize
            for a in jax.tree_util.tree_leaves(rs))
        y = np.asarray(spmv_csr_ring(rs, x, mesh))
        ok = spmv_matches(y, csr, x_h, rel_tol=1e-5)
        traffic = ring_traffic_report(rs)
        row = {
            "n": n, "build_s": round(build_s, 1),
            "plan_count": n * n,    # n diag + n*(n-1) ring
            "leaf_bytes": leaf_bytes,
            "u_max": rs.u_max,
            "pack_len": list(rs.pack_len),
            "correct": bool(ok),
            "ring_bytes": traffic.get("ring_bytes"),
            "replicate_bytes": traffic.get("replicate_bytes"),
            "compression": traffic.get("compression"),
        }
        rows.append(row)
        log(f"n={n}: build {build_s:.1f}s leaves {leaf_bytes/1e9:.2f} GB "
            f"u_max={rs.u_max} correct={ok}")
    report = {
        "matrix": {"rows": args.rows, "nnz": csr.nnz,
                   "kind": "web_graph avg=12"},
        "policy": "shard_csr_ring raises WindowEllOverflow past "
                  "TPU_SPMV_RING_MAX (default 16); callers fall back to "
                  "the replicated-packed form (O(n) plans)",
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    log(f"-> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
