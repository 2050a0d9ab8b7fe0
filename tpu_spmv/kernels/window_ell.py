"""Window-ELL Pallas kernel — the fast CSR paths (C8 vector + C9 merge-path).

TPU-native re-design of the reference's two load-balanced CSR kernels:

* ``spmv_csr_vector_kernel`` (warp-per-row + ``__shfl_down_sync`` butterfly,
  ``spmv_kernels.cu:133-165``) — on TPU the 128-lane VPU replaces the
  32-thread warp: **each lane owns one row**, and the cross-lane shuffle
  reduction becomes a structural sublane-axis reduce.
* ``spmv_csr_merge_path_kernel`` (equal-work 2D merge partitioning with
  ``atomicAdd`` combines, ``spmv_kernels.cu:75-130``) — on TPU equal work is
  achieved at plan time: long rows are **split stride-wise** into bounded
  extra rows and over-full cells **spill** into extra rows, and the
  non-deterministic atomicAdd is replaced by a deterministic segment-sum
  over the (few) extra-row partials.

Layout (built host-side by :class:`WindowEllPlan`):

* ``x`` is zero-padded to ``cols_pad`` and reshaped ``(cols_pad/128, 128)``;
  a *window* is 1024 consecutive columns = one (8,128) block of x, resident
  in VMEM (replacing the reference's texture cache over x, C11 /
  ``spmv_kernels.cu:7-39``).
* non-zeros are packed into (8,128) **groups**: lane = row mod 128,
  sublane = (col/128) mod 8 (so the col's x entry lives in that table row),
  one group per (128-row block, window, layer).
* the gather ``x[col]`` is a single hardware lane-gather
  (``take_along_axis(table, col % 128, axis=1)``) — the only fast dynamic
  gather the TPU VPU exposes; the packing constraint exists precisely to
  make every gather lane-local.  The gather index ``col % 128 < 128`` is
  stored as **int8** (5 bytes/slot with the f32 value).
* the grid runs over *steps* of ``step_groups`` groups; each step streams a
  ``(8*step_groups, 128)`` block of values+indices, gathers per group from
  the VMEM x window named by a scalar-prefetched per-group index, reduces
  each group over sublanes, and accumulates the (1,128) row partial into a
  revolving (8,128) output block covering a 1024-row *superblock*
  (sequential TPU grid ⇒ deterministic, no atomics).

Measured on TPU v5e: ~845 GB/s on the packed streams at ``step_groups=64``
— at the chip's STREAM rate, i.e. the kernel is HBM-bound; end-to-end SpMV
efficiency is set by slot occupancy (real nnz / padded slots).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..csr import CSRMatrix, _bucket
from ..errors import InvalidFormatError

LANE = 128
CHUNKS = 8            # table rows (col chunks) per window
WINDOW = 1024         # columns per window (CHUNKS * LANE)
ROWS_PER_BLOCK = 128  # lanes
SUPERBLOCK = 1024     # rows per output block (8 row-blocks)


class WindowEllOverflow(InvalidFormatError):
    """The packed layout would inflate memory beyond ``max_inflation`` —
    the structure is too adversarial for this kernel; callers fall back to
    the scalar path (mirrors the selector's role, C6)."""


def _pad_pow2(n: int, minimum: int = 1) -> int:
    n = max(n, minimum)
    return 1 << (n - 1).bit_length()


def _cumcount(keys: np.ndarray) -> np.ndarray:
    """Occurrence index of each element within its key group (native hash
    pass when the C++ library is built; NumPy sort fallback otherwise)."""
    from ..native import cumcount

    return cumcount(keys)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class WindowEllPlan:
    """Host-built packed layout for the window-ELL kernel.

    ``split_rows=None`` → vector-CSR semantics; ``split_rows=S`` →
    merge-path semantics (rows stride-split into ≤S-nnz extra rows).  In
    both modes over-full cells spill to extra rows, and only the extras go
    through the final segment-sum combine — ordinary rows come straight out
    of the kernel's output block.
    """

    vals: jax.Array          # f32 (n_groups*8, 128)
    lo: jax.Array            # i8  (n_groups*8, 128)  col % 128 per slot
    wg: jax.Array            # i32 (n_groups,)  x-window per group
    sbg: jax.Array           # i32 (n_groups,)  row sub-block (0-7) per group
    sup_step: jax.Array      # i32 (n_steps,)   output superblock per step
    extra_to_row: jax.Array  # i32 (n_extra,)   combine map for extra rows
    num_rows: int
    num_cols: int
    extras_base: int         # first extra-row position (128-aligned)
    n_extra: int
    n_sup: int
    cols_pad: int
    step_groups: int
    split_rows: int | None
    occupancy: float

    def tree_flatten(self):
        leaves = (self.vals, self.lo, self.wg, self.sbg, self.sup_step,
                  self.extra_to_row)
        # occupancy is diagnostic only — excluded from aux so it never
        # fragments the jit cache (plans reconstructed via pytree ops
        # report occupancy 0.0)
        aux = (self.num_rows, self.num_cols, self.extras_base, self.n_extra,
               self.n_sup, self.cols_pad, self.step_groups, self.split_rows,
               0.0)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @property
    def n_groups(self) -> int:
        return int(self.wg.shape[0])

    @property
    def n_steps(self) -> int:
        return int(self.sup_step.shape[0])

    @staticmethod
    def build(csr: CSRMatrix, split_rows: int | None = None,
              step_groups: int | None = None, cap_slack: int = 2,
              max_inflation: float = 64.0, device=None) -> "WindowEllPlan":
        """Pack a host CSR matrix into the window-ELL layout (vectorized).

        Raises :class:`WindowEllOverflow` when padding would exceed
        ``max_inflation`` x nnz slots (plus a 64K-slot floor), signalling the
        caller to use the scalar kernel instead.
        """
        rows, nnz = csr.num_rows, csr.nnz
        cols_pad = _bucket(max(csr.num_cols, 1))
        n_windows = cols_pad // WINDOW
        if step_groups is None:
            # 64 saturates HBM on TPU; small steps keep interpret-mode
            # (CPU test) tracing cheap
            step_groups = 64 if not _use_interpret() else 8
        S = step_groups
        row_len = np.diff(csr.row_ptrs).astype(np.int64)

        # ---- strided row splitting (merge-path equal-work) ----
        if split_rows:
            parts = np.maximum(-(-row_len // split_rows), 1)
        else:
            parts = np.ones(rows, np.int64)
        extras_per_row = parts - 1
        n_extra_split = int(extras_per_row.sum())
        extra_base_of_row = np.zeros(rows, np.int64)
        if rows:
            np.cumsum(extras_per_row[:-1], out=extra_base_of_row[1:])
        extra_to_row = np.repeat(np.arange(rows, dtype=np.int64),
                                 extras_per_row)
        extras_base = -(-max(rows, 1) // ROWS_PER_BLOCK) * ROWS_PER_BLOCK

        if nnz:
            row_of_nnz = np.repeat(np.arange(rows, dtype=np.int64), row_len)
            in_row = np.arange(nnz, dtype=np.int64) - \
                np.repeat(csr.row_ptrs[:-1].astype(np.int64), row_len)
            part = in_row % np.repeat(parts, row_len)  # strided assignment
            pos = np.where(
                part == 0, row_of_nnz,
                extras_base + np.repeat(extra_base_of_row, row_len)
                + part - 1)
            cols64 = csr.col_indices.astype(np.int64)
            w = cols64 // WINDOW
            c = (cols64 // LANE) % CHUNKS
        else:
            row_of_nnz = pos = cols64 = w = c = np.zeros(0, np.int64)

        def layers_of(pos):
            lane = pos % ROWS_PER_BLOCK
            b = pos // ROWS_PER_BLOCK
            key = ((b * n_windows + w) * CHUNKS + c) * ROWS_PER_BLOCK + lane
            return b, lane, _cumcount(key)

        b, lane, layer = layers_of(pos)

        # ---- layer cap + spill to extra rows ----
        n_extra = n_extra_split
        if nnz:
            bw = b * n_windows + w
            ubw, inv, cnt = np.unique(bw, return_inverse=True,
                                      return_counts=True)
            cap = -(-cnt // WINDOW) + cap_slack
            spilled = layer >= cap[inv]
            if spilled.any():
                skey = row_of_nnz[spilled] * n_windows + w[spilled]
                su, sinv = np.unique(skey, return_inverse=True)
                pos = pos.copy()
                pos[spilled] = extras_base + n_extra_split + sinv
                extra_to_row = np.concatenate([extra_to_row, su // n_windows])
                n_extra += len(su)
                b, lane, layer = layers_of(pos)
                bw = b * n_windows + w
                ubw, inv = np.unique(bw, return_inverse=True)
        else:
            ubw = np.zeros(0, np.int64)
            inv = np.zeros(0, np.int64)

        # ---- groups per (block, window) ----
        lmax = np.zeros(len(ubw), np.int64)
        if nnz:
            np.maximum.at(lmax, inv, layer + 1)
        g_b = np.repeat(ubw // n_windows, lmax)
        g_w = np.repeat(ubw % n_windows, lmax)
        g_sup = g_b // (SUPERBLOCK // ROWS_PER_BLOCK)
        total_pos = extras_base + n_extra
        # power-of-two bucket bounds the compiled-variant count; padded
        # superblocks get no groups and are sliced away unread
        n_sup_real = max(-(-max(total_pos, 1) // SUPERBLOCK), 1)
        n_sup = _pad_pow2(n_sup_real)

        # only REAL superblocks need groups (empty real sups need one pad
        # step to zero their output; bucket-padding sups are never read)
        counts_per_sup = np.bincount(g_sup, minlength=n_sup_real) \
            if len(g_sup) else np.zeros(n_sup_real, np.int64)
        pad_per_sup = (-counts_per_sup) % S
        pad_per_sup[counts_per_sup == 0] = S
        pad_sup = np.repeat(np.arange(n_sup_real, dtype=np.int64),
                            pad_per_sup)

        all_sup = np.concatenate([g_sup, pad_sup])
        order = np.argsort(all_sup, kind="stable")  # reals precede pads
        n_groups = len(all_sup)

        # memory-blowup guard: the layer-cap spill absorbs adversarial
        # structure, so this only fires when the padded layout would still
        # be both large in absolute terms (> 4M slots = 20 MB) and heavily
        # inflated relative to nnz
        slots = n_groups * CHUNKS * LANE
        if nnz and slots > max_inflation * nnz and slots > (1 << 22):
            raise WindowEllOverflow(
                f"window-ELL padding {slots} slots for {nnz} nnz "
                f"(inflation {slots / nnz:.1f}x > {max_inflation}x)")

        inv_order = np.empty(n_groups, np.int64)
        inv_order[order] = np.arange(n_groups, dtype=np.int64)
        group_start = np.zeros(len(ubw), np.int64)
        if len(ubw):
            np.cumsum(lmax[:-1], out=group_start[1:])
        group_base = inv_order[group_start] if len(ubw) else group_start

        all_b = np.concatenate([g_b, pad_sup * (SUPERBLOCK // ROWS_PER_BLOCK)])
        all_w = np.concatenate([g_w, np.zeros(len(pad_sup), np.int64)])
        final_b = all_b[order]
        final_w = all_w[order]
        final_sup = all_sup[order]

        # pad steps to a power-of-two bucket (bounds jit recompiles)
        n_steps = n_groups // S
        n_steps_pad = _pad_pow2(n_steps)
        pad_groups = (n_steps_pad - n_steps) * S
        if pad_groups:
            final_b = np.concatenate([
                final_b, np.full(pad_groups,
                                 (n_sup - 1) * (SUPERBLOCK // ROWS_PER_BLOCK),
                                 np.int64)])
            final_w = np.concatenate([final_w,
                                      np.zeros(pad_groups, np.int64)])
            final_sup = np.concatenate([
                final_sup, np.full(pad_groups, n_sup - 1, np.int64)])
        n_groups_pad = n_steps_pad * S

        vals = np.zeros((n_groups_pad * CHUNKS, LANE), np.float32)
        lo = np.zeros((n_groups_pad * CHUNKS, LANE), np.int8)
        if nnz:
            group_of_nnz = group_base[inv] + layer
            flat = group_of_nnz * (CHUNKS * LANE) + c * LANE + lane
            vals.reshape(-1)[flat] = csr.values
            lo.reshape(-1)[flat] = (cols64 % LANE).astype(np.int8)

        put = (lambda a: jax.device_put(a, device)) if device is not None \
            else jax.device_put
        return WindowEllPlan(
            vals=put(jnp.asarray(vals)),
            lo=put(jnp.asarray(lo)),
            wg=put(jnp.asarray(final_w.astype(np.int32))),
            sbg=put(jnp.asarray(
                (final_b % (SUPERBLOCK // ROWS_PER_BLOCK)).astype(np.int32))),
            sup_step=put(jnp.asarray(
                final_sup[::S].astype(np.int32))),
            extra_to_row=put(jnp.asarray(extra_to_row.astype(np.int32))),
            num_rows=rows,
            num_cols=csr.num_cols,
            extras_base=int(extras_base),
            n_extra=int(n_extra),
            n_sup=int(n_sup),
            cols_pad=cols_pad,
            step_groups=S,
            split_rows=split_rows,
            occupancy=float(nnz / slots) if slots else 0.0,
        )


def _use_interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


@functools.lru_cache(maxsize=64)
def _build_pallas(n_steps: int, S: int, n_sup: int, cols8: int,
                  interpret: bool):
    def kernel(wg_ref, sbg_ref, sup_ref, x_ref, v_ref, lo_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(jnp.logical_or(
            i == 0, sup_ref[i] != sup_ref[jnp.maximum(i - 1, 0)]))
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        lo_all = lo_ref[:].astype(jnp.int32)  # i8 storage → i32 gather idx
        v_all = v_ref[:]
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
        acc = jnp.zeros((8, LANE), jnp.float32)
        for t in range(S):
            w = wg_ref[i * S + t]
            sb = sbg_ref[i * S + t]
            table = x_ref[pl.ds(pl.multiple_of(w * CHUNKS, CHUNKS), CHUNKS), :]
            g = jnp.take_along_axis(table, lo_all[8 * t:8 * t + 8, :], axis=1)
            partial = jnp.sum(v_all[8 * t:8 * t + 8, :] * g, axis=0,
                              keepdims=True)
            acc = acc + jnp.where(sub_iota == sb,
                                  jnp.broadcast_to(partial, (8, LANE)), 0.0)
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
        ],
        out_specs=pl.BlockSpec((8, LANE),
                               lambda i, wg, sbg, sup: (sup[i], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_sup * 8, LANE), jnp.float32),
        interpret=interpret,
    )


@jax.jit
def spmv_window_ell(plan: WindowEllPlan, x: jax.Array) -> jax.Array:
    """``y = A @ x`` via the window-ELL plan.  ``x`` is the unpadded operand
    (``num_cols``,); returns ``(num_rows,)``."""
    x = jnp.asarray(x, jnp.float32)
    x_pad = jnp.pad(x, (0, plan.cols_pad - x.shape[0]))
    x2d = x_pad.reshape(plan.cols_pad // LANE, LANE)
    fn = _build_pallas(plan.n_steps, plan.step_groups, plan.n_sup,
                       plan.cols_pad // LANE, _use_interpret())
    out = fn(plan.wg, plan.sbg, plan.sup_step, x2d, plan.vals, plan.lo)
    y_flat = out.reshape(-1)          # position p = row-slot p
    y = y_flat[: plan.num_rows]
    if plan.n_extra:
        extras = y_flat[plan.extras_base: plan.extras_base + plan.n_extra]
        y = y + jax.ops.segment_sum(extras, plan.extra_to_row,
                                    num_segments=plan.num_rows)
    return y
