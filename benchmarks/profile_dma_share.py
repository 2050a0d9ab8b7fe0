"""Verify that Pallas skips the input DMA when consecutive grid steps map
to the same block index — the mechanism that lets several output
superblocks share one streamed HBM block.

If skipping works, runtime should stay ~constant as `reuse` grows (same
bytes fetched, more steps); if not, runtime grows linearly with reuse.
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


def build(n_steps: int, S: int, n_out: int, direct: bool = False):
    def kernel(blk_ref, out_idx_ref, v_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(jnp.logical_or(
            i == 0, out_idx_ref[i] != out_idx_ref[jnp.maximum(i - 1, 0)]))
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] = o_ref[:] + jnp.sum(v_ref[:].reshape(S, 8, LANE), axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((S * 8, LANE),
                         (lambda i, blk, oi: (i, 0)) if direct else
                         (lambda i, blk, oi: (blk[i], 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANE), lambda i, blk, oi: (oi[i], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out * 8, LANE), jnp.float32),
    )


def main():
    S = 128
    n_blocks = 256
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.random((n_blocks * S * 8, LANE), np.float32))
    print(f"data: {vals.nbytes/1e6:.0f} MB, S={S}, blocks={n_blocks}")

    for reuse in [0, 1, 2, 4, 8]:
        direct = reuse == 0
        reuse = max(reuse, 1)
        n_steps = n_blocks * reuse
        blk = jnp.asarray(np.repeat(np.arange(n_blocks, dtype=np.int32),
                                    reuse))
        oi = jnp.asarray((np.arange(n_steps, dtype=np.int64) * 64
                          // n_steps).astype(np.int32))
        fn = build(n_steps, S, 64, direct)
        f = jax.jit(lambda *a: fn(*a))
        secs = time_jitted(f, blk, oi, vals, iters=20)
        gbs = vals.nbytes / secs / 1e9
        print(f"  reuse={reuse}{' direct' if direct else ''}: {secs*1e3:7.3f} ms  {gbs:7.1f} GB/s "
              f"({secs/n_steps*1e9:6.0f} ns/step)")


if __name__ == "__main__":
    main()
