"""Micro-profiler for the window-ELL kernel's cost components.

Ablates the kernel one stage at a time on a synthetic fully-dense plan
(occupancy ~1) so the raw stream rate is isolated from layout occupancy:

  stream   — read the vals block, accumulate a sum (HBM roof for this spec)
  +lo      — also read the i8 lane-index block
  +gather  — also lane-gather x from the VMEM table
  +select  — full kernel body (gather + sublane-select accumulate)

Run on real TPU:  python benchmarks/profile_kernel.py [n_steps] [S]
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from tpu_spmv.timing import time_jitted  # noqa: E402

LANE = 128
CHUNKS = 8


def build(n_steps: int, S: int, n_sup: int, cols8: int, mode: str):
    def kernel(wg_ref, sbg_ref, sup_ref, x_ref, v_ref, lo_ref, sb_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        v_all = v_ref[:]
        if mode == "stream":
            o_ref[:] = o_ref[:] + jnp.sum(
                v_all.reshape(S, 8, LANE), axis=0)
            return
        lo_all = lo_ref[:].astype(jnp.int32)
        sb_all = sb_ref[:].astype(jnp.int32)
        if mode == "+lo":
            o_ref[:] = o_ref[:] + jnp.sum(
                (v_all + lo_all.astype(jnp.float32)).reshape(S, 8, LANE),
                axis=0)
            return
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
        acc = jnp.zeros((8, LANE), jnp.float32)
        for t in range(S):
            w = wg_ref[i * S + t]
            table = x_ref[pl.ds(pl.multiple_of(w * CHUNKS, CHUNKS), CHUNKS), :]
            g = jnp.take_along_axis(table, lo_all[8 * t:8 * t + 8, :], axis=1)
            if mode == "+gather":
                acc = acc + v_all[8 * t:8 * t + 8, :] * g
            elif mode == "+select":  # group-level target sublane
                sb = sbg_ref[i * S + t]
                partial = jnp.sum(v_all[8 * t:8 * t + 8, :] * g, axis=0,
                                  keepdims=True)
                acc = acc + jnp.where(sub_iota == sb,
                                      jnp.broadcast_to(partial, (8, LANE)),
                                      0.0)
            else:  # +scatterN: per-slot target sublane (N masked sums)
                n_t = int(mode.replace("+scatter", ""))
                prod = v_all[8 * t:8 * t + 8, :] * g
                sb_g = sb_all[8 * t:8 * t + 8, :]
                rows = [jnp.sum(jnp.where(sb_g == s, prod, 0.0), axis=0,
                                keepdims=True) for s in range(n_t)]
                rows = rows * (8 // n_t)
                acc = acc + jnp.concatenate(rows, axis=0)
        o_ref[:] = o_ref[:] + acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((cols8, LANE), lambda i, *m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S * 8, LANE), lambda i, *m: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S * 8, LANE), lambda i, *m: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S * 8, LANE), lambda i, *m: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANE),
                               lambda i, wg, sbg, sup: (sup[i], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_sup * 8, LANE), jnp.float32),
    )


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    S_list = [int(sys.argv[2])] if len(sys.argv) > 2 else [16, 32, 64, 128]
    cols8 = 32          # 4096 columns → 4 windows
    n_sup = 64

    for S in S_list:
        n_groups = n_steps * S
        rng = np.random.default_rng(0)
        vals = jnp.asarray(rng.random((n_groups * 8, LANE), np.float32))
        lo = jnp.asarray(rng.integers(0, LANE, (n_groups * 8, LANE),
                                      dtype=np.int8))
        sb8 = jnp.asarray(rng.integers(0, 8, (n_groups * 8, LANE),
                                       dtype=np.int8))
        wg = jnp.asarray(rng.integers(0, cols8 // CHUNKS, (n_groups,),
                                      dtype=np.int32))
        sbg = jnp.asarray(rng.integers(0, 8, (n_groups,), dtype=np.int32))
        sup = jnp.asarray(
            np.minimum(np.arange(n_steps) * n_sup // n_steps,
                       n_sup - 1).astype(np.int32))
        x2d = jnp.asarray(rng.random((cols8, LANE), np.float32))

        nbytes = vals.nbytes + lo.nbytes  # sb8 counted per-mode below
        print(f"S={S:4d} steps={n_steps} groups={n_groups} "
              f"stream={nbytes/1e6:.0f}MB")
        for mode in ["+gather", "+select", "+scatter2", "+scatter4",
                     "+scatter8", "+scatter8"]:
            fn = build(n_steps, S, n_sup, cols8, mode)
            f = jax.jit(lambda *a: fn(*a))
            secs = time_jitted(f, wg, sbg, sup, x2d, vals, lo, sb8, iters=300)
            b = nbytes + (sb8.nbytes if mode == "+scatter8" else 0)
            gbs = b / secs / 1e9
            slot_ns = secs / (n_groups * 8 * LANE) * 1e9
            print(f"  {mode:8s} {secs*1e3:7.3f} ms  {gbs:7.1f} GB/s  "
                  f"{slot_ns*1000:6.2f} ps/slot")


if __name__ == "__main__":
    main()
