"""Scalar CSR kernel (C7 analog) — the universal/naive device path.

The reference scalar kernel assigns one CUDA thread per row with a serial
gather loop (``spmv_kernels.cu:168-188``).  There is no per-thread program on
a TPU; the idiomatic "simple" formulation is the flat composition

    y = segment_sum(values * x[col_indices], row_ids)

entirely in XLA: a device gather over the padded nnz extent, an elementwise
multiply, and a sorted deterministic scatter-add keyed by the per-nnz row
ids that :class:`~tpu_spmv.csr.DeviceCSR` precomputes at transfer time.

This flat composition is the UNIVERSAL floor: no preprocessing, no VMEM
residency requirement, no limit on ``num_cols`` — but XLA's TPU gather/
scatter run ~0.1 Gelem/s, so it is ~3 orders below the packed kernels.
Since round 4 the public ``KernelType.SCALAR_CSR`` therefore dispatches
to the NAIVE packed layout (lane-per-row window-ELL with the spill/split
machinery disabled — the honest TPU analog of the reference's simple
one-thread-per-row device kernel) and this module serves only the last
resort: structures every packed layout rejects, and the interpret-mode
oracle comparisons.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..csr import DeviceCSR


def pad_x(x: jax.Array, cols_pad: int) -> jax.Array:
    """Zero-pad the operand vector to the device padding bucket."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    if n == cols_pad:
        return x
    return jnp.pad(x, (0, cols_pad - n))


@jax.jit
def spmv_csr_scalar(dev: DeviceCSR, x: jax.Array) -> jax.Array:
    """``y = A @ x`` over the padded extent; returns ``(rows_pad,)``.

    Padding nnz have ``value == 0`` and point at the last padded row, so no
    masking is needed (cf. ``DeviceCSR`` docstring).  ``x`` must already be
    padded to ``cols_pad`` (see :func:`pad_x`); padded gather reads hit
    ``x[0]`` with a zero multiplier.
    """
    rows_pad = dev.row_ptrs.shape[0] - 1
    gathered = jnp.take(x, dev.col_indices, mode="clip")
    prod = dev.values * gathered
    return jax.ops.segment_sum(
        prod, dev.row_ids, num_segments=rows_pad, indices_are_sorted=True
    )
