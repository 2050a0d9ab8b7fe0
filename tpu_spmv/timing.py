"""Device timing utilities.

The reference times every kernel with cudaEvents around the launch
(``spmv_kernels.cu:258-310``).  There is no TPU analog of device-side event
timestamps visible to the host; worse, on remote-attached TPUs the runtime's
dispatch is asynchronous and ``block_until_ready`` can return before the
computation finishes, so wall-clocking a single dispatch measures RPC
latency, not kernel time.

The reliable protocol (used by the benchmark harness, C14): chain ``iters``
executions of the op *inside one jitted program* via ``lax.fori_loop`` with a
data dependency between iterations (so XLA cannot hoist or CSE the op), then
force completion by fetching one scalar to the host.  Per-iteration time =
total / iters.  The data dependency is a ``carry * 1e-30`` perturbation of
one float input — a relative change of ~1e-30, far below fp32 resolution of
any result we compare.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _perturb(tree, carry):
    """Add carry*1e-30 to the first float leaf (dependency injection)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    done = False
    out = []
    for leaf in leaves:
        if not done and hasattr(leaf, "dtype") and \
                jnp.issubdtype(leaf.dtype, jnp.floating):
            out.append(leaf + carry.astype(leaf.dtype) * 1e-30)
            done = True
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def _probe_scalar(result) -> jax.Array:
    """A data-dependent f32 scalar from an arbitrary result pytree."""
    for leaf in jax.tree_util.tree_leaves(result):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.ravel(leaf)[0].astype(jnp.float32)
    return jnp.float32(0.0)


def time_jitted(fn: Callable, *args, iters: int = 10,
                warmup: bool = True) -> float:
    """Seconds per execution of ``fn(*args)``, measured by chaining ``iters``
    executions inside one jitted program (see module docstring)."""

    @jax.jit
    def looped(*a):
        def body(_, carry):
            res = fn(*_perturb(a, carry))
            return _probe_scalar(res)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    if warmup:
        _ = float(np.asarray(looped(*args)))  # compile + one full run
    t0 = time.perf_counter()
    _ = float(np.asarray(looped(*args)))      # host fetch forces completion
    return (time.perf_counter() - t0) / iters


def time_runs(fn: Callable, *args, num_runs: int = 20, iters_per_run: int = 5,
              warmup_runs: int = 1) -> list[float]:
    """Benchmark-harness protocol: ``num_runs`` independent measurements
    (each itself an ``iters_per_run``-chained jitted loop), for avg/min/max/
    stddev statistics (reference protocol, ``benchmark.cu:41-72``)."""

    @jax.jit
    def looped(*a):
        def body(_, carry):
            res = fn(*_perturb(a, carry))
            return _probe_scalar(res)
        return jax.lax.fori_loop(0, iters_per_run, body, jnp.float32(0.0))

    for _ in range(max(warmup_runs, 1)):
        _ = float(np.asarray(looped(*args)))
    times = []
    for _ in range(num_runs):
        t0 = time.perf_counter()
        _ = float(np.asarray(looped(*args)))
        times.append((time.perf_counter() - t0) / iters_per_run)
    return times
