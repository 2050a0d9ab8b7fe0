"""On-device A/B of the structure-adaptive reordering pass (round 5).

CPU slot accounting says RCM block reordering cuts group counts ~4.9x
on scrambled-banded structure and ~1.65x on scrambled-clustered
structure at 262K rows, while iid web graphs show no modeled gain
(docs/PERF.md round-5 section).  This measures wall clock for each
planted-locality flavor (natural dispatch plan vs the reordered build)
plus the iid no-regression leg (reorder FORCED onto a web graph), and
times the Pallas chunk-permute passes standalone.

Usage: python benchmarks/ab_reorder.py [--rows N]   (real TPU,
~10-20 min at 262K rows: four plan builds + uploads)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=262_144)
    args = ap.parse_args()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    import jax
    import jax.numpy as jnp

    from tpu_spmv.bandwidth import measured_stream_bandwidth
    from tpu_spmv.kernels.reorder import (block_order, build_reordered,
                                          maybe_reorder, permute_chunks,
                                          reorder_gain)
    from tpu_spmv.kernels.window_ell import build_auto
    from tpu_spmv.timing import time_jitted
    from tpu_spmv.utils.testing import (RandomGenerator, clustered_csr,
                                        scrambled_banded_csr, spmv_matches,
                                        web_graph_csr)

    dev = jax.devices()[0]
    cpu0 = jax.local_devices(backend="cpu")[0]
    print(f"device: {dev.device_kind} rows={args.rows}", flush=True)
    stream = measured_stream_bandwidth(dev)
    print(f"STREAM {stream:.0f} GB/s", flush=True)
    rng = RandomGenerator(42)

    def to_dev(tree):
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(tree),
            [jax.device_put(np.asarray(a), dev)
             for a in jax.tree_util.tree_leaves(tree)])

    # standalone permute-pass cost (the per-call overhead a reordered
    # plan pays twice)
    n = args.rows
    nb = -(-n // 128)
    xs = jnp.asarray(rng.vector(n))
    src = jax.device_put(
        jnp.asarray(np.random.default_rng(0).permutation(nb), jnp.int32),
        dev)
    xs = jax.device_put(xs, dev)
    import functools
    perm_fn = jax.jit(functools.partial(permute_chunks, out_len=nb * 128))
    s = time_jitted(perm_fn, xs, src, iters=300, samples=5,
                    estimator="median")
    print(f"permute_chunks({n}): {s*1e6:.1f} us "
          f"({2 * n * 4 / s / 1e9:.0f} GB/s copy rate)", flush=True)

    cases = (
        ("banded", lambda: scrambled_banded_csr(
            rng, args.rows, bandwidth=4096, avg_nnz=12.0)),
        ("clustered", lambda: clustered_csr(
            rng, args.rows, n_clusters=32, avg_nnz=14.0)),
        ("iid-web", lambda: web_graph_csr(
            rng, args.rows, args.rows, avg_nnz=15.0)),
    )
    for name, gen in cases:
        csr = gen()
        x_h = rng.vector(csr.num_cols)
        x = jax.device_put(jnp.asarray(np.asarray(x_h)), dev)
        bm = (csr.nnz * 8 + (csr.num_rows + 1) * 4 + csr.num_cols * 4
              + csr.num_rows * 4)
        t0 = time.time()
        probe = maybe_reorder(csr)
        t_probe = time.time() - t0
        print(f"[{name}] nnz={csr.nnz} probe={'apply' if probe is not None else 'skip'} "
              f"({t_probe:.1f}s)", flush=True)
        order = probe if probe is not None else block_order(csr)
        nat_c, prm_c = reorder_gain(csr, order)
        print(f"[{name}] model cost nat={nat_c:.3g} prm={prm_c:.3g} "
              f"ratio={prm_c/nat_c:.3f}", flush=True)
        rows = {}
        for label in ("natural", "reordered"):
            t0 = time.time()
            try:
                if label == "natural":
                    fn, ph = build_auto(csr, device=cpu0)
                else:
                    fn, ph = build_reordered(csr, order=order, device=cpu0)
            except Exception as e:
                print(f"[{name}] {label}: build failed "
                      f"{type(e).__name__} {e}", flush=True)
                continue
            try:
                p = to_dev(ph)
                build_s = time.time() - t0
                y = np.asarray(fn(p, x))
                ok = spmv_matches(y, csr, x_h, rel_tol=1e-5)
                s = time_jitted(fn, p, x, iters=100, samples=5,
                                estimator="median")
                rows[label] = s
                inner = getattr(ph, "inner", ph)
                n_plans = len(getattr(inner, "plans", (1,)))
                print(f"[{name}] {label}: kind={type(inner).__name__}/"
                      f"{n_plans} sup={inner.sup} groups={inner.n_groups} "
                      f"occ={inner.occupancy:.4f} build={build_s:.0f}s "
                      f"ok={ok} t={s*1e3:.3f} ms = {bm/s/1e9:.2f} GB/s",
                      flush=True)
            except Exception as e:
                print(f"[{name}] {label}: FAILED {type(e).__name__}: {e}",
                      flush=True)
        if len(rows) == 2:
            print(f"[{name}] reorder speedup: "
                  f"{rows['natural']/rows['reordered']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
