"""Round-3 probe: multi-vreg sublane gather as a permutation scatter.

The wide-sparse scatter redesign (PERF.md "permutation-scatter"): with a
plan guarantee of <=1 nonzero per (row, half-run), each output vreg's
contribution is a GATHER from the half-run's 64-sublane product stack:

    out_j[s, l] += where(valid, stacked[src_j[s, l], l], 0)

via take_along_axis(..., axis=0) — confirmed to lower fast for 8-deep
vregs (proto_v3 sgather: 8.64 ps/slot).  This probe measures the
64-deep variant at several output-vreg counts, with the src planes
streamed from HBM like a real plan would:

  sg64_16  — 16 output vregs per half-run (sup=16384 regime)
  sg64_64  — 64 output vregs per half-run (sup=65536 regime)
  sg64_8   — 8 output vregs (sup=8192 regime)
  msum128  — 128-target masked-sum reference (the current wide path)

Usage: python benchmarks/proto_v4.py [mode ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from tpu_spmv.timing import time_jitted  # noqa: E402

LANE = 128
CHUNKS = 8
T = 16
TB = 8


def build(n_steps: int, S: int, out8: int, cols8: int, mode: str,
          n_out: int):
    def kernel(wg_ref, base_ref, x_ref, v_ref, lo_ref, sb_ref, src_ref,
               o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        def body(q, carry):
            qs = pl.multiple_of(q * T * CHUNKS, T * CHUNKS)
            lo_q = lo_ref[pl.ds(qs, T * CHUNKS), :].astype(jnp.int32)
            v_q = v_ref[pl.ds(qs, T * CHUNKS), :]
            prods = []
            for t in range(T):
                wdw = wg_ref[i * S + q * T + t]
                table = x_ref[
                    pl.ds(pl.multiple_of(wdw * CHUNKS, CHUNKS), CHUNKS), :]
                g = jnp.take_along_axis(table, lo_q[8 * t:8 * t + 8, :],
                                        axis=1)
                prods.append(v_q[8 * t:8 * t + 8, :] * g)
            prod = jnp.concatenate(prods, axis=0)

            if mode == "msum128":
                sb_q = sb_ref[pl.ds(qs, T * CHUNKS), :].astype(jnp.int32)
                for h in range(T // TB):
                    ph = prod[TB * 8 * h:TB * 8 * (h + 1), :]
                    sh = sb_q[TB * 8 * h:TB * 8 * (h + 1), :]
                    rows = [jnp.sum(jnp.where(sh == t, ph, 0.0), axis=0,
                                    keepdims=True) for t in range(128)]
                    acc = jnp.concatenate(rows, axis=0)
                    dst = pl.multiple_of(
                        base_ref[(i * S + q * T) // TB + h] * 128, 8)
                    o_ref[pl.ds(dst, 128), :] += acc
            else:
                # permutation scatter: src planes for this sub-tile
                # (n_out vregs of int8 per half-run, streamed)
                ss = q * (T // TB) * n_out * 8
                if not isinstance(q, int):
                    ss = pl.multiple_of(ss, (T // TB) * n_out * 8)
                for h in range(T // TB):
                    ph = prod[TB * 8 * h:TB * 8 * (h + 1), :]
                    base = pl.multiple_of(
                        base_ref[(i * S + q * T) // TB + h] * 8, 8)
                    for j in range(n_out):
                        sj = src_ref[
                            pl.ds(ss + (h * n_out + j) * 8, 8), :] \
                            .astype(jnp.int32)
                        g = jnp.take_along_axis(ph, sj & 63, axis=0)
                        contrib = jnp.where(sj < 64, g, 0.0)
                        o_ref[pl.ds(base + j * 8, 8), :] += contrib
            return carry

        jax.lax.fori_loop(0, S // T, body, 0)

    n_src = (S // TB) * n_out * 8 if mode != "msum128" else 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((cols8, LANE), lambda i, *m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S * CHUNKS, LANE), lambda i, *m: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S * CHUNKS, LANE), lambda i, *m: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S * CHUNKS, LANE), lambda i, *m: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_src, LANE), lambda i, *m: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((out8, LANE), lambda i, *m: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out8, LANE), jnp.float32),
    )


def main():
    modes = sys.argv[1:] or ["sg64_8", "sg64_16", "sg64_64", "msum128"]
    n_steps, S = 64, 128
    cols8 = 32
    out8 = 4096
    n_groups = n_steps * S
    n_runs = n_groups // TB
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.random((n_groups * CHUNKS, LANE),
                                  ).astype(np.float32))
    lo = jnp.asarray(rng.integers(0, LANE, (n_groups * CHUNKS, LANE),
                                  dtype=np.int8))
    sb128 = jnp.asarray(rng.integers(0, 128, (n_groups * CHUNKS, LANE),
                                     dtype=np.int8))
    wg = jnp.asarray(rng.integers(0, cols8 // CHUNKS, (n_groups,),
                                  dtype=np.int32))
    x2d = jnp.asarray(rng.random((cols8, LANE)).astype(np.float32))

    for mode in modes:
        n_out = int(mode.split("_")[1]) if "_" in mode else 16
        if mode == "msum128":
            base = jnp.asarray(
                rng.integers(0, out8 // 128, (n_runs,)).astype(np.int32))
            src = jnp.asarray(np.zeros((n_steps * 8, LANE), np.int8))
        else:
            base = jnp.asarray(
                rng.integers(0, out8 // 8 - n_out, (n_runs,))
                .astype(np.int32))
            src = jnp.asarray(rng.integers(0, 256, (
                n_steps * (S // TB) * n_out * 8, LANE)).astype(np.int8))
        nbytes = vals.nbytes + lo.nbytes + sb128.nbytes + \
            (src.nbytes if mode != "msum128" else 0)
        try:
            fn = build(n_steps, S, out8, cols8, mode, n_out)
            f = jax.jit(lambda *a: fn(*a))
            t0 = time.time()
            f(wg, base, x2d, vals, lo, sb128, src).block_until_ready()
            compile_s = time.time() - t0
            secs = time_jitted(f, wg, base, x2d, vals, lo, sb128, src,
                               iters=100)
            slot_ps = secs / (n_groups * CHUNKS * LANE) * 1e12
            print(f"{mode:8s} {secs*1e3:7.3f} ms  "
                  f"{nbytes/secs/1e9:7.1f} GB/s  {slot_ps:6.2f} ps/slot "
                  f"(compile {compile_s:.0f}s, stream {nbytes/1e6:.0f} MB)")
        except Exception as e:
            print(f"{mode:8s} FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
