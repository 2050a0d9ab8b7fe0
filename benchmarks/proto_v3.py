"""Round-3 scatter/stream prototypes for the window-ELL kernel (real TPU).

Candidates, each including the real window gather + multiply:

  base     — round-2 final shape: T=16 sub-tile statically unrolled,
             8 masked sums per 8-group half, (8,128) RMW at an 8-aligned
             dynamic base (the narrow-sup production path)
  nib      — same, but the sb stream nibble-packed ACROSS GROUP PAIRS:
             groups 2t/2t+1 share one (8,128) int8 vreg (lo/hi nibble),
             so the sb stream halves (6 -> 5.5 B/slot).  Round 2 paired
             WITHIN a group (4-row slices) and hit a 15x Mosaic compile
             blowup; cross-group pairing needs only (8,128)-aligned
             slices and two cheap bitwise unpacks.
  w128     — wide-superblock reference: fori loop, 128 masked-sum
             targets per 8-group half into a (128,128) region at an
             aligned base (the current sup=16384 path's scatter cost)
  ind8     — indirect-8: 8 masked sums per 8-group half (sb is 3-bit),
             then 8 single-sublane RMWs at ARBITRARY scalar-prefetched
             output sublanes.  Decouples scatter-target locality from
             superblock alignment: a run can serve any 8 of the
             output's 128-row classes (the wide-sparse redesign).
  ind8u    — ind8 with the sub-tile loop statically unrolled
  sgather  — per-group within-vreg sublane gather scatter probe:
             take_along_axis(prod_vreg, idx_vreg, axis=0) — measures
             whether/how Mosaic lowers a sublane gather (the
             permutation-scatter primitive)

Usage: python benchmarks/proto_v3.py [mode ...] (default: all)
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
T = 16          # groups per sub-tile
TB = 8          # groups per scatter half (one base / target-set)


def build(n_steps: int, S: int, out8: int, cols8: int, mode: str):
    unroll = mode in ("base", "nib", "sgather", "ind8u", "mrg")

    def kernel(wg_ref, base_ref, x_ref, v_ref, lo_ref, sb_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        def body(q):
            qs = q * T * CHUNKS
            if not isinstance(q, int):
                qs = pl.multiple_of(qs, T * CHUNKS)
            lo_q = lo_ref[pl.ds(qs, T * CHUNKS), :].astype(jnp.int32)
            v_q = v_ref[pl.ds(qs, T * CHUNKS), :]
            if mode == "mrg":
                sb_q = lo_ref[
                    pl.ds(S * CHUNKS + qs, T * CHUNKS), :].astype(jnp.int32)
            elif mode == "nib":
                qs2 = q * (T // 2) * CHUNKS
                if not isinstance(q, int):
                    qs2 = pl.multiple_of(qs2, (T // 2) * CHUNKS)
                sb_pk = sb_ref[pl.ds(qs2, (T // 2) * CHUNKS), :] \
                    .astype(jnp.int32)
                sb_even = sb_pk & 15          # groups 2t
                sb_odd = sb_pk >> 4           # groups 2t+1
            else:
                sb_q = sb_ref[pl.ds(qs, T * CHUNKS), :].astype(jnp.int32)
            prods = []
            for t in range(T):
                wdw = wg_ref[i * S + q * T + t]
                table = x_ref[
                    pl.ds(pl.multiple_of(wdw * CHUNKS, CHUNKS), CHUNKS), :]
                g = jnp.take_along_axis(table, lo_q[8 * t:8 * t + 8, :],
                                        axis=1)
                prods.append(v_q[8 * t:8 * t + 8, :] * g)

            if mode == "sgather":
                # permutation probe: per-group sublane gather of the
                # product vreg by the (int) sb vreg, merged into an
                # 8-aligned dynamic base (correctness not meaningful —
                # cost/lowering probe only)
                for h in range(T // TB):
                    acc = jnp.zeros((8, LANE), jnp.float32)
                    for t in range(TB):
                        k = TB * h + t
                        idx = sb_q[8 * k:8 * k + 8, :]
                        acc = acc + jnp.take_along_axis(prods[k], idx,
                                                        axis=0)
                    dst = pl.multiple_of(
                        base_ref[(i * S + q * T) // TB + h] * 8, 8)
                    o_ref[pl.ds(dst, 8), :] += acc
                return

            prod = jnp.concatenate(prods, axis=0)
            if mode in ("base", "nib", "mrg"):
                for h in range(T // TB):
                    ph = prod[TB * 8 * h:TB * 8 * (h + 1), :]
                    if mode == "nib":
                        # interleave even/odd group sb back into run order
                        sh = jnp.concatenate(
                            [(sb_even if t % 2 == 0 else sb_odd)[
                                ((TB * h + t) // 2) * 8:
                                ((TB * h + t) // 2) * 8 + 8, :]
                             for t in range(TB)], axis=0)
                    else:
                        sh = sb_q[TB * 8 * h:TB * 8 * (h + 1), :]
                    rows = [jnp.sum(jnp.where(sh == t, ph, 0.0), axis=0,
                                    keepdims=True) for t in range(8)]
                    acc = jnp.concatenate(rows, axis=0)
                    dst = pl.multiple_of(
                        base_ref[(i * S + q * T) // TB + h] * 8, 8)
                    o_ref[pl.ds(dst, 8), :] += acc
            elif mode == "w128":
                for h in range(T // TB):
                    ph = prod[TB * 8 * h:TB * 8 * (h + 1), :]
                    sh = sb_q[TB * 8 * h:TB * 8 * (h + 1), :]
                    rows = [jnp.sum(jnp.where(sh == t, ph, 0.0), axis=0,
                                    keepdims=True) for t in range(128)]
                    acc = jnp.concatenate(rows, axis=0)
                    dst = pl.multiple_of(
                        base_ref[(i * S + q * T) // TB + h] * 128, 8)
                    o_ref[pl.ds(dst, 128), :] += acc
            elif mode in ("ind8", "ind8u"):
                for h in range(T // TB):
                    ph = prod[TB * 8 * h:TB * 8 * (h + 1), :]
                    sh = sb_q[TB * 8 * h:TB * 8 * (h + 1), :]
                    rows = [jnp.sum(jnp.where(sh == t, ph, 0.0), axis=0,
                                    keepdims=True) for t in range(8)]
                    run = (i * S + q * T) // TB + h
                    for t in range(8):
                        dst = base_ref[run * 8 + t]
                        o_ref[pl.ds(dst, 1), :] += rows[t]

        if unroll:
            for q in range(S // T):
                body(q)
        else:
            jax.lax.fori_loop(0, S // T, lambda q, c: (body(q), c)[1], 0)

    nb = (S * CHUNKS) // 2 if mode == "nib" else S * CHUNKS
    lo_rows = 2 * S * CHUNKS if mode == "mrg" else S * CHUNKS
    if mode == "mrg":
        nb = 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((cols8, LANE), lambda i, *m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S * CHUNKS, LANE), lambda i, *m: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lo_rows, LANE), lambda i, *m: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, LANE), lambda i, *m: (0, 0) if nb == 8
                         else (i, 0), memory_space=pltpu.VMEM),
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
    modes = sys.argv[1:] or ["base", "nib", "ind8", "ind8u", "w128",
                             "sgather"]
    n_steps, S = 128, 128
    cols8 = 32
    out8 = 2048
    n_groups = n_steps * S
    n_runs = n_groups // TB
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.random((n_groups * CHUNKS, LANE),
                                  ).astype(np.float32))
    lo = jnp.asarray(rng.integers(0, LANE, (n_groups * CHUNKS, LANE),
                                  dtype=np.int8))
    sb8 = rng.integers(0, 8, (n_groups * CHUNKS, LANE), dtype=np.int8)
    sb128 = rng.integers(0, 128, (n_groups * CHUNKS, LANE), dtype=np.int8)
    # nibble-packed: group 2t in low nibble, 2t+1 in high
    pairs = sb8.reshape(n_groups // 2, 2, CHUNKS, LANE)
    sbnib = (pairs[:, 0] | (pairs[:, 1] << 4)).reshape(-1, LANE)
    wg = jnp.asarray(rng.integers(0, cols8 // CHUNKS, (n_groups,),
                                  dtype=np.int32))
    base_run = rng.integers(0, out8 // 8 - 16, (n_runs,)).astype(np.int32)
    base_w128 = rng.integers(0, out8 // 128, (n_runs,)).astype(np.int32)
    tgt = rng.integers(0, out8 - 1, (n_runs * 8,)).astype(np.int32)
    x2d = jnp.asarray(rng.random((cols8, LANE)).astype(np.float32))

    lo_np = np.asarray(lo)
    sb8_np = np.asarray(sb8)
    merged = np.concatenate(
        [lo_np.reshape(n_steps, S * CHUNKS, LANE),
         sb8_np.reshape(n_steps, S * CHUNKS, LANE)],
        axis=1).reshape(-1, LANE)
    for mode in modes:
        sb = {"nib": sbnib, "w128": sb128}.get(mode, sb8)
        sbj = jnp.asarray(sb)
        base = {"ind8": tgt, "ind8u": tgt, "w128": base_w128} \
            .get(mode, base_run)
        basej = jnp.asarray(base)
        lo_in = jnp.asarray(merged) if mode == "mrg" else lo
        if mode == "mrg":
            sbj = jnp.zeros((n_steps * 8, LANE), jnp.int8)
        nbytes = vals.nbytes + lo_in.nbytes + sbj.nbytes
        try:
            fn = build(n_steps, S, out8, cols8, mode)
            f = jax.jit(lambda *a: fn(*a))
            t0 = time.time()
            f(wg, basej, x2d, vals, lo_in, sbj).block_until_ready()
            compile_s = time.time() - t0
            secs = time_jitted(f, wg, basej, x2d, vals, lo_in, sbj,
                               iters=300, samples=3, estimator="median")
            gbs = nbytes / secs / 1e9
            slot_ps = secs / (n_groups * CHUNKS * LANE) * 1e12
            print(f"{mode:8s} {secs*1e3:7.3f} ms  {gbs:7.1f} GB/s  "
                  f"{slot_ps:6.2f} ps/slot  (compile {compile_s:.0f}s, "
                  f"stream {nbytes/1e6:.0f} MB)")
        except Exception as e:
            print(f"{mode:8s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
