"""ELL device kernel (C10 analog).

The reference ELL kernel is one thread per row looping over column-major
slots with a pad test (``spmv_kernels.cu:191-213``).  The TPU formulation
keeps the same slot-major traversal but vectorizes it over all rows at once:
``DeviceELL`` stores ``(slots, rows_pad)`` arrays, so slot ``k`` is one
contiguous row-vector per operand — ideal streaming layout — and the whole
SpMV is a slot-axis reduction of masked gather-multiplies.

v1 uses the XLA gather (fine for the modest ``max_nnz_per_row`` matrices ELL
targets); the padding mask is ``col >= 0`` exactly as the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ell import DeviceELL


@jax.jit
def spmv_ell_device(dev: DeviceELL, x: jax.Array) -> jax.Array:
    """``y = A @ x`` for device ELL; returns ``(rows_pad,)``."""
    x = jnp.asarray(x, jnp.float32)
    cols = dev.col_indices                       # (slots, rows_pad)
    valid = cols >= 0
    safe = jnp.where(valid, cols, 0)
    gathered = jnp.take(x, safe, mode="clip")    # (slots, rows_pad)
    prod = jnp.where(valid, dev.values * gathered, 0.0)
    return jnp.sum(prod, axis=0)
