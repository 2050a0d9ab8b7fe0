"""On-device A/B of the scatter-run length (``t_base``) on the headline.

The plan pads every superblock's group run to a multiple of ``tb`` with
zero-slot groups (expectation (tb-1)/2 per superblock); shorter runs
buy that padding back at the cost of more (n_tb,128) output
read-modify-writes per compute sub-tile (2 at tb=8, 4 at 4, 8 at 2 —
see the ``T_BASE`` comment in kernels/window_ell.py).  CPU slot
accounting on the 10M-nnz leveled headline (benchmarks/pad_decompose.py
sizing, round 5): S=256 15360 → 14592 (tb=4, −5.0%) → 14080 (tb=2,
−8.3%) groups.  Whether the byte saving survives the extra fold work is
a device question — this A/B answers it with the standard discipline
(oracle check, 5-sample median slopes, STREAM physics guard, plan
fingerprints).

Usage: python benchmarks/ab_tbase.py  (real TPU, ~15 min: 6 plans)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    import jax
    import jax.numpy as jnp

    from tpu_spmv.bandwidth import measured_stream_bandwidth
    from tpu_spmv.kernels.window_ell import WindowEllPlan, spmv_window_ell
    from tpu_spmv.timing import time_jitted
    from tpu_spmv.utils.testing import RandomGenerator, spmv_matches

    from tpu_spmv import native as _native

    _native.require()

    dev = jax.devices()[0]
    cpu0 = jax.local_devices(backend="cpu")[0]
    print(f"device: {dev.device_kind}", flush=True)
    rng = RandomGenerator(42)
    csr = rng.power_law_csr(262144, 4096, avg_nnz=40.0, alpha=1.6)
    x_h = rng.vector(4096)
    x = jnp.asarray(x_h)
    stream = measured_stream_bandwidth(dev)
    print(f"STREAM {stream:.0f} GB/s", flush=True)

    configs = [(S, tb) for S in (256, 384) for tb in (8, 4, 2)]
    seen_fps = {}
    for S, tb in configs:
        label = f"S={S} tb={tb}"
        try:
            t0 = time.time()
            ph = WindowEllPlan.build(csr, split_rows=128, step_groups=S,
                                     device=cpu0, permute_rows=True,
                                     t_base=tb)
            fp = (int(ph.n_groups), round(float(ph.occupancy), 6),
                  int(ph.n_extra), S, tb)
            if fp in seen_fps:
                print(f"{label}: DUPLICATE PLAN of [{seen_fps[fp]}] "
                      f"(fingerprint {fp}); skipping", flush=True)
                continue
            seen_fps[fp] = label
            p = ph.to_device(dev)
            build_s = time.time() - t0
            y = np.asarray(spmv_window_ell(p, x))
            ok = spmv_matches(y, csr, x_h, rel_tol=1e-5)
            best = None
            for _ in range(3):
                s = time_jitted(spmv_window_ell, p, x, iters=300,
                                samples=5, estimator="median")
                act = p.n_groups * 1024 * (5.5 if p.sbn else 6.0) \
                    + (p.cols_pad + (p.e8 + p.out8) * 128) * 4 \
                    + (0 if p.lam is None else int(p.lam.size) * 12)
                if act / s / 1e9 <= stream * 1.02:
                    best = s
                    break
            bw = None
            if best:
                model = csr.nnz * 8 + (csr.num_rows + 1) * 4 \
                    + csr.num_cols * 4 + csr.num_rows * 4
                bw = model / best / 1e9
            print(f"{label}: groups={p.n_groups} occ={ph.occupancy:.4f} "
                  f"build={build_s:.0f}s ok={ok} "
                  f"t={'%.1f us' % (best * 1e6) if best else 'GUARD-FAIL'}"
                  f"{' = %.1f GB/s byte-model' % bw if bw else ''}",
                  flush=True)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
