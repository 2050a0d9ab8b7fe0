"""Prototype micro-bench for the v2 window-ELL inner loop (round 2).

Candidates measured on real TPU, all including the real gather+multiply:

  gather  — gather + multiply only, one static accumulate (compute floor)
  v1x16   — round-1 shape: T=16 sub-tile, 16 masked sums into a fixed
            (16,128) out region (no dynamic base)
  v2s8    — T=8 sub-tile, 8 masked sums, ONE dynamic-base read-modify-
            write per sub-tile (plan guarantees sub-tile shares a base)
  v2s16   — T=16 sub-tile, 8 masked sums, one dynamic-base RMW
  v2g16   — T=16 sub-tile, per-GROUP 8 masked sums + per-group RMW
            (free per-group base, no padding constraint)

Usage: python benchmarks/proto_v2.py [n_steps] [S]
"""

from __future__ import annotations

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


def build(n_steps: int, S: int, out8: int, cols8: int, mode: str):
    base_mode = mode.replace("v3", "v2").replace("v2gather", "gather")
    if base_mode in ("v1x16", "gather", "v2b8"):
        T = 16
    else:
        T = 16 if base_mode.endswith("16") else 8

    split = mode.startswith("v3")   # gather table separate from scatter ref

    def kernel(wg_ref, base_ref, x_ref, v_ref, lo_ref, sb_ref, o_ref,
               tab_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
            tab_ref[:] = x_ref[:]

        tab = tab_ref if split else o_ref

        def body(q, carry):
            qs = pl.multiple_of(q * T * 8, T * 8)
            lo_q = lo_ref[pl.ds(qs, T * 8), :].astype(jnp.int32)
            v_q = v_ref[pl.ds(qs, T * 8), :]
            sb_q = sb_ref[pl.ds(qs, T * 8), :].astype(jnp.int32)
            prods = []
            for t in range(T):
                wdw = wg_ref[i * S + q * T + t]
                table = tab[
                    pl.ds(pl.multiple_of(wdw * CHUNKS, CHUNKS), CHUNKS), :]
                g = jnp.take_along_axis(table, lo_q[8 * t:8 * t + 8, :],
                                        axis=1)
                prods.append(v_q[8 * t:8 * t + 8, :] * g)
            prod = jnp.concatenate(prods, axis=0)

            if base_mode == "gather":
                o_ref[pl.ds(cols8, 16), :] += jnp.concatenate(
                    [jnp.sum(prod.reshape(T, 8, LANE), axis=0)] * 2, axis=0)
            elif base_mode == "v1x16":
                rows = [jnp.sum(jnp.where(sb_q == t, prod, 0.0), axis=0,
                                keepdims=True) for t in range(16)]
                o_ref[pl.ds(cols8, 16), :] += jnp.concatenate(rows, axis=0)
            elif base_mode in ("v2s8", "v2s16"):
                rows = [jnp.sum(jnp.where(sb_q == t, prod, 0.0), axis=0,
                                keepdims=True) for t in range(8)]
                acc = jnp.concatenate(rows, axis=0)
                dst = pl.multiple_of(base_ref[i * S + q * T] * 8, 8)
                o_ref[pl.ds(dst, 8), :] += acc
            elif base_mode == "v2b8":   # T=16 compute, 2 RMWs (8-group base)
                for h in range(2):
                    ph = prod[64 * h:64 * h + 64, :]
                    sh = sb_q[64 * h:64 * h + 64, :]
                    rows = [jnp.sum(jnp.where(sh == t, ph, 0.0), axis=0,
                                    keepdims=True) for t in range(8)]
                    acc = jnp.concatenate(rows, axis=0)
                    dst = pl.multiple_of(
                        base_ref[i * S + q * T + 8 * h] * 8, 8)
                    o_ref[pl.ds(dst, 8), :] += acc
            elif base_mode == "v2g16":
                for t in range(T):
                    p8 = prod[8 * t:8 * t + 8, :]
                    s8 = sb_q[8 * t:8 * t + 8, :]
                    rows = [jnp.sum(jnp.where(s8 == tt, p8, 0.0), axis=0,
                                    keepdims=True) for tt in range(8)]
                    acc = jnp.concatenate(rows, axis=0)
                    dst = pl.multiple_of(
                        base_ref[i * S + q * T + t] * 8, 8)
                    o_ref[pl.ds(dst, 8), :] += acc
            return carry

        jax.lax.fori_loop(0, S // T, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
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
        out_specs=pl.BlockSpec((cols8 + out8, LANE), lambda i, *m: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((cols8, LANE), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cols8 + out8, LANE), jnp.float32),
    )


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    cols8 = 32
    out8 = 2048          # 256K rows of scatter space
    n_groups = n_steps * S
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.random((n_groups * 8, LANE)).astype(np.float32))
    lo = jnp.asarray(rng.integers(0, LANE, (n_groups * 8, LANE),
                                  dtype=np.int8))
    sb8 = jnp.asarray(rng.integers(0, 8, (n_groups * 8, LANE),
                                   dtype=np.int8))
    wg = jnp.asarray(rng.integers(0, cols8 // CHUNKS, (n_groups,),
                                  dtype=np.int32))
    # bases: sub-tile-aligned random targets into the scatter space,
    # 8-aligned sublane units
    base = (cols8 // 8 + rng.integers(0, out8 // 8 - 1, (n_groups,))) * 1
    base = jnp.asarray(base.astype(np.int32))

    x2d = jnp.asarray(rng.random((cols8, LANE)).astype(np.float32))
    nbytes = vals.nbytes + lo.nbytes + sb8.nbytes
    print(f"steps={n_steps} S={S} groups={n_groups} stream={nbytes/1e6:.0f}MB")
    for mode in ["v3s16", "v3s8", "v3b8", "v3s16", "v3s8", "v3b8"]:
        fn = build(n_steps, S, out8, cols8, mode)
        f = jax.jit(lambda *a: fn(*a))
        secs = time_jitted(f, wg, base, x2d, vals, lo, sb8, iters=300)
        gbs = nbytes / secs / 1e9
        slot_ps = secs / (n_groups * 8 * LANE) * 1e12
        print(f"  {mode:7s} {secs*1e3:7.3f} ms  {gbs:7.1f} GB/s  "
              f"{slot_ps:6.2f} ps/slot")


if __name__ == "__main__":
    main()
