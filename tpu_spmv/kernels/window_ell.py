"""Window-ELL Pallas kernel — the fast CSR paths (C8 vector + C9 merge-path).

TPU-native re-design of the reference's two load-balanced CSR kernels:

* ``spmv_csr_vector_kernel`` (warp-per-row + ``__shfl_down_sync`` butterfly,
  ``spmv_kernels.cu:133-165``) — on TPU the 128-lane VPU replaces the
  32-thread warp: **each lane owns one row**, and the cross-lane shuffle
  reduction becomes a structural sublane-axis reduce.
* ``spmv_csr_merge_path_kernel`` (equal-work 2D merge partitioning with
  ``atomicAdd`` combines, ``spmv_kernels.cu:75-130``) — on TPU equal-work
  partitioning is achieved by **splitting long rows into bounded virtual
  rows** at plan time, and the non-deterministic atomicAdd is replaced by a
  deterministic ``segment_sum`` combine over the (few) virtual-row partials.

Layout ("window-ELL", built host-side by :class:`WindowEllPlan`):

* ``x`` is zero-padded to ``cols_pad`` and reshaped ``(cols_pad/128, 128)``;
  a *window* is 1024 consecutive columns = 8 table rows = one (8,128) VPU
  register of x, resident in VMEM (this replaces the reference's texture
  cache over x, C11 / ``spmv_kernels.cu:7-39``).
* non-zeros are packed into (sublanes,128) tiles: **lane = row mod 128**,
  **sublane ≡ (col/128) mod 8** (so the col's x-entry lives in that table
  row), layered when a (row, col-chunk) pair has multiple nnz.
* the gather ``x[col]`` is a single hardware lane-gather
  (``take_along_axis(table, col % 128, axis=1)``) — the only fast dynamic
  gather the TPU VPU exposes; the packing constraint exists precisely to
  make every gather lane-local.
* the per-slot gather index is ``col % 128 < 128``, so it is stored as
  **int8** (5 bytes/slot total with the f32 value vs the flat format's
  8 bytes/nnz) — the main reason the kernel can approach the reference's
  CSR byte model despite slot padding.
* row sums are a structural reduce over the sublane axis; tiles are sorted
  by row-block so consecutive grid steps accumulate into a revolving VMEM
  output block (sequential TPU grid ⇒ deterministic, no atomics).

Measured on TPU v5e: the gather+reduce inner loop runs at ~0.9x the speed of
a same-shaped pure streaming kernel, i.e. the kernel is HBM-bound.
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
CHUNKS = 8          # table rows per window
WINDOW = 1024       # columns per window (CHUNKS * LANE)
ROWS_PER_BLOCK = 128


class WindowEllOverflow(InvalidFormatError):
    """The packed layout would inflate memory beyond ``max_inflation`` —
    the structure is too sparse/adversarial for this kernel; callers fall
    back to the scalar path (mirrors the selector's role, C6)."""


def _pad_pow2(n: int, minimum: int = 8) -> int:
    n = max(n, minimum)
    return 1 << (n - 1).bit_length()


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class WindowEllPlan:
    """Host-built packed layout for the window-ELL kernel.

    ``split_rows=None`` → vector-CSR semantics (one virtual row per row);
    ``split_rows=S`` → merge-path semantics (rows split into ≤S-nnz virtual
    rows, combined by a deterministic segment-sum).
    """

    vals: jax.Array          # f32 (tiles*sublanes, 128)
    lo: jax.Array            # i8  (tiles*sublanes, 128)  col % 128 per slot
    tile_rb: jax.Array       # i32 (tiles,)  output row-block per tile
    tile_w: jax.Array        # i32 (tiles,)  x-window per tile
    virt_to_row: jax.Array   # i32 (n_virt,) virtual→real row (identity slice
    #                          when split_rows is None)
    num_rows: int
    num_cols: int
    n_virt: int
    blocks: int
    cols_pad: int
    sublanes: int
    split_rows: int | None
    occupancy: float

    # -- pytree protocol --
    def tree_flatten(self):
        leaves = (self.vals, self.lo, self.tile_rb, self.tile_w,
                  self.virt_to_row)
        aux = (self.num_rows, self.num_cols, self.n_virt, self.blocks,
               self.cols_pad, self.sublanes, self.split_rows, self.occupancy)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @property
    def n_tiles(self) -> int:
        return int(self.tile_rb.shape[0])

    @staticmethod
    def build(csr: CSRMatrix, sublanes: int = 32,
              split_rows: int | None = None,
              max_inflation: float = 32.0, device=None) -> "WindowEllPlan":
        """Pack a host CSR matrix into the window-ELL layout (vectorized).

        Raises :class:`WindowEllOverflow` when padding would exceed
        ``max_inflation`` x nnz slots (plus a fixed allowance), signalling
        the caller to use the scalar kernel instead.
        """
        if sublanes % 32 or sublanes <= 0:
            # int8 tiles need a 32-sublane granularity (min tile (32,128))
            raise InvalidFormatError("sublanes must be a positive multiple of 32")
        lpt = sublanes // 8
        rows, nnz = csr.num_rows, csr.nnz
        cols_pad = _bucket(max(csr.num_cols, 1))
        n_windows = cols_pad // WINDOW
        row_len = np.diff(csr.row_ptrs).astype(np.int64)

        # --- virtual rows (merge-path row splitting) ---
        if split_rows:
            parts = -(-row_len // split_rows)  # ceil; 0 for empty rows
            n_virt = int(parts.sum())
            virt_to_row = np.repeat(np.arange(rows, dtype=np.int64), parts)
            if nnz:
                virt_base = np.zeros(rows, np.int64)
                np.cumsum(parts[:-1], out=virt_base[1:])
                in_row = np.arange(nnz, dtype=np.int64) - \
                    np.repeat(csr.row_ptrs[:-1].astype(np.int64), row_len)
                nnz_virt = np.repeat(virt_base, row_len) + in_row // split_rows
            else:
                nnz_virt = np.zeros(0, np.int64)
        else:
            n_virt = rows
            virt_to_row = np.arange(rows, dtype=np.int64)
            nnz_virt = np.repeat(np.arange(rows, dtype=np.int64), row_len)

        blocks = max(-(-max(n_virt, 1) // ROWS_PER_BLOCK), 1)

        # --- per-nnz slot coordinates ---
        cols64 = csr.col_indices.astype(np.int64)
        w = cols64 // WINDOW
        c = (cols64 // LANE) % CHUNKS
        lane = nnz_virt % ROWS_PER_BLOCK
        b = nnz_virt // ROWS_PER_BLOCK

        # layer = occurrence count within (block, window, chunk, lane)
        gid = ((b * n_windows + w) * CHUNKS + c) * ROWS_PER_BLOCK + lane
        order = np.argsort(gid, kind="stable")
        sg = gid[order]
        run_starts = np.flatnonzero(np.r_[True, sg[1:] != sg[:-1]])
        run_counts = np.diff(np.r_[run_starts, nnz])
        layer = np.empty(nnz, np.int64)
        layer[order] = np.arange(nnz, dtype=np.int64) - \
            np.repeat(run_starts, run_counts)

        # --- tiles per (block, window) ---
        bw = b * n_windows + w
        ubw, inv = np.unique(bw, return_inverse=True)
        lmax = np.zeros(len(ubw), np.int64)
        np.maximum.at(lmax, inv, layer + 1)
        tiles_per = -(-lmax // lpt)
        # every output block needs >= 1 tile (pallas outputs are
        # uninitialized unless written)
        present = np.unique(ubw // n_windows) if len(ubw) else \
            np.zeros(0, np.int64)
        missing = np.setdiff1d(np.arange(blocks, dtype=np.int64), present)
        ubw_all = np.concatenate([ubw, missing * n_windows])
        tiles_all = np.concatenate([tiles_per,
                                    np.ones(len(missing), np.int64)])
        sort_ix = np.argsort(ubw_all, kind="stable")
        ubw_all, tiles_all = ubw_all[sort_ix], tiles_all[sort_ix]
        tile_base = np.zeros(len(ubw_all), np.int64)
        np.cumsum(tiles_all[:-1], out=tile_base[1:])
        t_data = int(tiles_all.sum())

        slots = t_data * sublanes * LANE
        if nnz and slots > max(max_inflation * nnz, 64 * 1024):
            raise WindowEllOverflow(
                f"window-ELL padding {slots} slots for {nnz} nnz "
                f"(inflation {slots / nnz:.1f}x > {max_inflation}x)")

        t_pad = _pad_pow2(t_data)
        vals = np.zeros((t_pad * sublanes, LANE), np.float32)
        lo = np.zeros((t_pad * sublanes, LANE), np.int8)
        if nnz:
            pos = np.searchsorted(ubw_all, ubw)  # ubw_all unique+sorted
            tile_of_nnz = tile_base[pos[inv]] + layer // lpt
            sub = c + CHUNKS * (layer % lpt)
            flat = tile_of_nnz * (sublanes * LANE) + sub * LANE + lane
            fv = vals.reshape(-1)
            fl = lo.reshape(-1)
            fv[flat] = csr.values
            fl[flat] = (cols64 % LANE).astype(np.int8)

        tile_rb = np.full(t_pad, blocks - 1, np.int32)
        tile_w = np.zeros(t_pad, np.int32)
        tile_rb[:t_data] = (ubw_all // n_windows).repeat(tiles_all)
        tile_w[:t_data] = (ubw_all % n_windows).repeat(tiles_all)

        put = (lambda a: jax.device_put(a, device)) if device is not None \
            else jax.device_put
        return WindowEllPlan(
            vals=put(jnp.asarray(vals)),
            lo=put(jnp.asarray(lo)),
            tile_rb=put(jnp.asarray(tile_rb)),
            tile_w=put(jnp.asarray(tile_w)),
            virt_to_row=put(jnp.asarray(virt_to_row.astype(np.int32))),
            num_rows=rows,
            num_cols=csr.num_cols,
            n_virt=n_virt,
            blocks=blocks,
            cols_pad=cols_pad,
            sublanes=sublanes,
            split_rows=split_rows,
            occupancy=float(nnz / slots) if slots else 0.0,
        )


def _use_interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


@functools.lru_cache(maxsize=64)
def _build_pallas(n_tiles: int, sublanes: int, blocks: int, cols8: int,
                  interpret: bool):
    lpt = sublanes // 8

    def kernel(rb_ref, w_ref, x_ref, v_ref, lo_ref, o_ref):
        i = pl.program_id(0)
        w = w_ref[i]
        table = x_ref[pl.ds(pl.multiple_of(w * CHUNKS, CHUNKS), CHUNKS), :]
        lo_all = lo_ref[:].astype(jnp.int32)   # i8 storage → i32 gather idx
        vals_all = v_ref[:]
        partial = jnp.zeros((1, LANE), jnp.float32)
        for k in range(lpt):
            g = jnp.take_along_axis(table, lo_all[8 * k:8 * k + 8, :], axis=1)
            partial = partial + jnp.sum(
                vals_all[8 * k:8 * k + 8, :] * g, axis=0, keepdims=True)
        first = i == 0
        changed = rb_ref[i] != rb_ref[jnp.maximum(i - 1, 0)]

        @pl.when(jnp.logical_or(first, changed))
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[0:1, :] = o_ref[0:1, :] + partial

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((cols8, LANE), lambda i, rb, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sublanes, LANE), lambda i, rb, w: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sublanes, LANE), lambda i, rb, w: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANE), lambda i, rb, w: (rb[i], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((blocks * 8, LANE), jnp.float32),
        interpret=interpret,
    )


@jax.jit
def spmv_window_ell(plan: WindowEllPlan, x: jax.Array) -> jax.Array:
    """``y = A @ x`` via the window-ELL plan.  ``x`` is the unpadded operand
    (``num_cols``,); returns ``(num_rows,)``."""
    x = jnp.asarray(x, jnp.float32)
    x_pad = jnp.pad(x, (0, plan.cols_pad - x.shape[0]))
    x2d = x_pad.reshape(plan.cols_pad // LANE, LANE)
    fn = _build_pallas(plan.n_tiles, plan.sublanes, plan.blocks,
                       plan.cols_pad // LANE, _use_interpret())
    out = fn(plan.tile_rb, plan.tile_w, x2d, plan.vals, plan.lo)
    y_virt = out.reshape(plan.blocks, 8, LANE)[:, 0, :].reshape(-1)
    if plan.split_rows is None:
        return y_virt[: plan.num_rows]
    return jax.ops.segment_sum(
        y_virt[: plan.n_virt], plan.virt_to_row,
        num_segments=plan.num_rows, indices_are_sorted=True)
