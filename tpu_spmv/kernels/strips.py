"""Column-strip decomposition — streaming x for very wide matrices.

The packed window-ELL kernels hold the operand vector resident in VMEM
(the TPU analog of the reference's texture-cached x,
``src/spmv_kernels.cu:7-39``), which caps ``num_cols``.  Matrices wider
than the cap used to fall to the flat XLA path — a ~1,400× bandwidth
cliff (VERDICT r03 missing #2; SURVEY §7 "streaming/chunked x").

A :class:`StripPlan` removes the cap by *column decomposition*:

    ``y = Σ_k  A[:, lo_k:hi_k] @ x[lo_k:hi_k]``

Each strip is an independent column range narrow enough for VMEM
residency, packed by the full :func:`~tpu_spmv.kernels.window_ell.
build_auto` machinery (superblock choice, balancing, banding).  The
per-strip kernels stream x exactly once in total (each column belongs to
one strip) and the nnz exactly once; the only extra traffic is ``K-1``
read-modify-writes of the output vector — noise against the packed
stream for any matrix dense enough to be worth running.  XLA pipelines
the per-strip pallas_calls back-to-back, which is the "chunked,
double-buffered HBM→VMEM x" of SURVEY §7 expressed at the XLA level:
strip k+1's input DMA overlaps strip k's compute.

This is a load-shaping transform of the same kernel — the TPU analog of
the reference splitting long rows across thread blocks — not a new
kernel.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from ..csr import CSRMatrix
from ..errors import InvalidFormatError
from .window_ell import (
    BandedPlan,
    WindowEllOverflow,
    build_auto,
    spmv_banded,
    spmv_window_ell,
)

# widest strip: one VMEM-resident x block (mirrors spmv.VMEM_X_MAX_COLS;
# duplicated here to avoid a circular import — test_spmv pins equality)
STRIP_MAX_COLS = 1 << 20


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class StripPlan:
    """A stack of packed plans over disjoint column ranges."""

    plans: tuple              # per-strip WindowEllPlan | BandedPlan
    num_rows: int
    num_cols: int
    bounds: tuple = ()        # per-strip (lo, hi) column range, static

    def tree_flatten(self):
        return ((self.plans,), (self.num_rows, self.num_cols, self.bounds))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(tuple(children[0]), *aux)

    @property
    def n_groups(self) -> int:
        return sum(p.n_groups for p in self.plans)

    @property
    def occupancy(self) -> float:
        tot = sum(p.n_groups for p in self.plans)
        nnz = sum(float(p.occupancy) * p.n_groups for p in self.plans)
        return nnz / tot if tot else 0.0

    def save(self, path: str) -> None:
        from ..plan_io import save_plan

        save_plan(self, path)

    @staticmethod
    def load(path: str, device=None) -> "StripPlan":
        from ..plan_io import load_plan

        plan = load_plan(path, device=device)
        if not isinstance(plan, StripPlan):
            raise InvalidFormatError(
                f"{path}: holds a {type(plan).__name__}, not a StripPlan")
        return plan


def _slice_cols(csr: CSRMatrix, lo: int, hi: int) -> CSRMatrix:
    """The column range ``[lo, hi)`` as an independent CSR (same rows,
    columns re-based to the strip)."""
    mask = (csr.col_indices >= lo) & (csr.col_indices < hi)
    rows_of = np.repeat(np.arange(csr.num_rows, dtype=np.int64),
                        np.diff(csr.row_ptrs).astype(np.int64))
    rr = rows_of[mask]
    ptr = np.zeros(csr.num_rows + 1, np.int32)
    np.cumsum(np.bincount(rr, minlength=csr.num_rows), out=ptr[1:])
    return CSRMatrix(csr.num_rows, hi - lo, csr.values[mask],
                     (csr.col_indices[mask] - lo).astype(np.int32), ptr)


def build_strips(csr: CSRMatrix, strip_cols: int = STRIP_MAX_COLS,
                 step_groups: int | None = None,
                 split_rows: int | None = None,
                 device=None, permute_rows: bool | None = None):
    """Build a :class:`StripPlan`; returns ``(kernel_fn, plan)`` like
    :func:`build_auto`.

    Raises :class:`WindowEllOverflow` when any non-empty strip rejects
    the packed layout (callers keep the flat path as the last resort).
    Empty strips (no nonzeros in the column range) are skipped.
    """
    if strip_cols <= 0:
        raise ValueError(f"strip_cols must be positive, got {strip_cols}")
    n_strips = max(1, -(-csr.num_cols // strip_cols))
    plans, bounds = [], []
    for k in range(n_strips):
        lo = k * strip_cols
        hi = min(csr.num_cols, lo + strip_cols)
        sub = _slice_cols(csr, lo, hi)
        if sub.nnz == 0:
            continue
        _, p = build_auto(sub, split_rows=split_rows,
                          step_groups=step_groups, device=device,
                          permute_rows=permute_rows)
        plans.append(p)
        bounds.append((lo, hi))
    sp = StripPlan(plans=tuple(plans), num_rows=csr.num_rows,
                   num_cols=csr.num_cols, bounds=tuple(bounds))
    return spmv_strips, sp


@jax.jit
def spmv_strips(sp: StripPlan, x: jax.Array) -> jax.Array:
    """``y = A @ x`` over a strip plan: per-strip packed kernels on
    static slices of x, summed.  Returns ``(num_rows,)``."""
    x = jnp.asarray(x, jnp.float32)
    y = None
    for p, (lo, hi) in zip(sp.plans, sp.bounds):
        fn = spmv_banded if isinstance(p, BandedPlan) else spmv_window_ell
        yk = fn(p, x[lo:hi])
        y = yk if y is None else y + yk
    if y is None:
        return jnp.zeros((sp.num_rows,), jnp.float32)
    return y


__all__ = [
    "StripPlan",
    "STRIP_MAX_COLS",
    "build_strips",
    "spmv_strips",
    "WindowEllOverflow",
]
