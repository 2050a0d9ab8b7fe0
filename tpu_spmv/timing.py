"""Device timing utilities.

The reference times every kernel with cudaEvents around the launch
(``spmv_kernels.cu:258-310``).  On a remote-attached TPU neither device
events nor wall-clocking a dispatch work:

* the runtime's ``block_until_ready`` can return before execution finishes,
  and every jitted dispatch carries a large constant round-trip cost
  (~30 ms measured) that swamps sub-millisecond kernels;
* XLA dead-code-eliminates work whose output is not fully consumed, so
  "run it and read one element" can measure nothing at all.

The protocol here fixes both:

1. chain ``n`` executions *inside one jitted program* via ``lax.fori_loop``
   with a data dependency (``carry * 1e-30`` perturbation of one float
   input) so XLA cannot hoist or CSE the op across iterations;
2. consume the result with a full ``jnp.sum`` of a float leaf (a reduce
   cannot be sliced away, so the whole computation is live);
3. measure the **slope** between an ``n``-iteration and a ``3n``-iteration
   loop: per-iteration time = (T(3n) − T(n)) / 2n.  The constant dispatch
   cost cancels exactly; ``n`` is auto-scaled so the differenced work is
   well above round-trip jitter.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

# measured constant per-dispatch round trip on the remote TPU runtime
_DISPATCH_FLOOR_S = 0.035
# target differenced-work duration per measurement (seconds)
_TARGET_WORK_S = 0.25
_MAX_ITERS = 50_000


def _max_iters() -> int:
    """Cap chained-loop depth off-TPU: interpret-mode Pallas is ~1000x
    slower, and CPU timing is functional (not a perf surface)."""
    return 8 if jax.devices()[0].platform != "tpu" else _MAX_ITERS


def _perturb(tree, carry):
    """Add carry*1e-30 to the SMALLEST non-scalar float leaf (dependency
    injection).  Perturbing the smallest leaf matters: the injected add
    materializes a fresh copy of that leaf every chained iteration, so
    targeting a large leaf (e.g. a packed plan's 100+ MB value array, the
    first float leaf of a (plan, x) call) silently adds an O(plan-size)
    HBM copy to every measured iteration — round-1 numbers carried ~40%
    of such contamination on the 10M-nnz headline."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    float_arrays = [
        i for i, leaf in enumerate(leaves)
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
        and getattr(leaf, "ndim", 0) >= 1
    ]
    if float_arrays:
        tgt = min(float_arrays, key=lambda i: leaves[i].size)
        leaves[tgt] = leaves[tgt] + carry.astype(leaves[tgt].dtype) * 1e-30
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _probe_scalar(result) -> jax.Array:
    """A DCE-proof data-dependent scalar: full-sum of the first float leaf."""
    for leaf in jax.tree_util.tree_leaves(result):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.sum(leaf).astype(jnp.float32)
    return jnp.float32(0.0)


def _make_loop(fn: Callable, iters: int):
    @jax.jit
    def looped(*a):
        def body(_, carry):
            res = fn(*_perturb(a, carry))
            return _probe_scalar(res) * jnp.float32(1e-30)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    return looped


def _run(looped, args) -> float:
    t0 = time.perf_counter()
    _ = float(np.asarray(looped(*args)))   # host fetch forces completion
    return time.perf_counter() - t0


def time_jitted(fn: Callable, *args, iters: int | None = None,
                warmup: bool = True, samples: int = 2,
                estimator: str = "min") -> float:
    """Seconds per execution of ``fn(*args)`` (see module docstring).

    ``iters`` optionally pins the base loop length; by default it is
    calibrated so the differenced measurement covers ~250 ms of real work.
    ``estimator="median"`` takes the median over ``samples`` slope pairs
    instead of the min — robust when the device's throughput state flips
    BETWEEN the T(n) and T(3n) runs (a phase flip makes a single
    differenced slope arbitrarily wrong in either direction; the
    shared tunnel chip shows ~15% bimodal phases).
    """
    if iters is None:
        probe = _make_loop(fn, 4)
        t_probe = _run(probe, args)       # includes compile; run again clean
        t_probe = _run(probe, args)
        per = max((t_probe - _DISPATCH_FLOOR_S) / 4, 1e-6)
        iters = int(min(max(4, _TARGET_WORK_S / (2 * per)), _max_iters()))
    f1 = _make_loop(fn, iters)
    f3 = _make_loop(fn, 3 * iters)
    _run(f1, args)                        # compile + warm
    _run(f3, args)
    slopes = []
    for _ in range(max(samples, 1)):
        t1 = _run(f1, args)
        t3 = _run(f3, args)
        dt = (t3 - t1) / (2 * iters)
        if dt > 0:
            slopes.append(dt)
    if not slopes:                        # degenerate (work below jitter)
        return max((_run(f3, args) - _DISPATCH_FLOOR_S) / (3 * iters), 1e-9)
    if estimator == "median":
        return float(np.median(slopes))
    return min(slopes)


def time_runs(fn: Callable, *args, num_runs: int = 20,
              iters_per_run: int | None = None,
              warmup_runs: int = 1) -> list[float]:
    """Benchmark-harness protocol: ``num_runs`` independent slope
    measurements for avg/min/max/stddev statistics (reference protocol,
    ``benchmark.cu:41-72``)."""
    if iters_per_run is None:
        probe = _make_loop(fn, 4)
        t_probe = _run(probe, args)
        t_probe = _run(probe, args)
        per = max((t_probe - _DISPATCH_FLOOR_S) / 4, 1e-6)
        iters_per_run = int(min(max(4, 0.05 / per), _max_iters()))
    f1 = _make_loop(fn, iters_per_run)
    f3 = _make_loop(fn, 3 * iters_per_run)
    for _ in range(max(warmup_runs, 1)):
        _run(f1, args)
        _run(f3, args)
    times = []
    for _ in range(num_runs):
        t1 = _run(f1, args)
        t3 = _run(f3, args)
        times.append(max((t3 - t1) / (2 * iters_per_run), 1e-9))
    return times
