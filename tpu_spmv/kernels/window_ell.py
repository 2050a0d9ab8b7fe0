"""Window-ELL Pallas kernel — the fast CSR paths (C8 vector + C9 merge-path).

TPU-native re-design of the reference's two load-balanced CSR kernels:

* ``spmv_csr_vector_kernel`` (warp-per-row + ``__shfl_down_sync`` butterfly,
  ``spmv_kernels.cu:133-165``) — on TPU the 128-lane VPU replaces the
  32-thread warp: **each lane owns the rows congruent to it mod 128**, and
  the cross-lane shuffle reduction becomes a masked sublane-axis reduce.
* ``spmv_csr_merge_path_kernel`` (equal-work 2D merge partitioning with
  ``atomicAdd`` combines, ``spmv_kernels.cu:75-130``) — on TPU equal work is
  achieved at plan time: long rows are **split stride-wise** into bounded
  extra rows, over-deep cells **spill** into extra rows, and the
  non-deterministic atomicAdd is replaced by a deterministic in-kernel
  fold of the extra-row partials (see below).

Layout (built host-side by :class:`WindowEllPlan`):

* ``x`` is zero-padded to ``cols_pad`` and reshaped ``(cols_pad/128, 128)``;
  a *window* is 1024 consecutive columns = one (8,128) block of x, resident
  in VMEM (replacing the reference's texture cache over x, C11 /
  ``spmv_kernels.cu:7-39``).
* non-zeros are packed into (8,128) **groups**.  A slot at (sublane ``c``,
  lane ``l``) of a group with window ``w`` holds a nonzero whose column
  lies in chunk ``c`` of window ``w`` (so the lane-gather
  ``take_along_axis(table, col % 128, axis=1)`` — the only fast dynamic
  gather the VPU exposes — fetches its x entry) and whose row satisfies
  ``row ≡ l (mod 128)`` within the group's ``SUP``-row *superblock*.  The
  row sub-block (``(row/128) % N_TB``) is stored **per slot** as int8
  (``sb``), so nonzeros stack densely: the packing cell is
  ``(superblock, window, chunk, lane)`` and cells stack layers
  independently — per-slot ``sb`` is what buys dense occupancy over a
  block-ELL layout (~6-10x fewer padded slots on power-law matrices).
* per-nnz streamed bytes: 4 (f32 value) + 1 (int8 lane index) + 1 (int8
  sub-block) = 6, vs the reference byte model's 8 (f32 value + i32 column).
* groups are sorted by superblock and packed **contiguously** into HBM
  blocks of ``step_groups`` groups — no per-superblock padding.  The grid
  runs one step per (superblock, block) pair; consecutive steps that share
  a block re-use its VMEM copy (Pallas skips the DMA when the block index
  repeats), and each step names its live group range ``[off, off+cnt)``
  via scalar prefetch.  Inside a step the block is processed in sub-tiles
  of ``T_SUB`` groups; sub-tiles outside the live range are skipped with
  ``pl.when``, and edge sub-tiles are masked by a group-index compare.
* per sub-tile, products are scatter-added by per-slot ``sb`` into a
  revolving (``N_TB``,128) output block covering the step's superblock
  (sequential TPU grid ⇒ deterministic, no atomics).
* cells deeper than the per-bucket layer cap spill to per-row extra rows
  (≤64 nnz each) appended after the real rows.  Extras superblocks run
  FIRST and publish their totals to a VMEM scratch table appended after x;
  unit-valued combine nonzeros in the row superblocks then gather those
  totals exactly like x entries — the whole combine happens inside the
  kernel, deterministically, with no host-side scatter.
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
SUP = 2048            # rows per output superblock
N_TB = SUP // ROWS_PER_BLOCK  # scatter targets per superblock
T_SUB = 16            # groups per compute sub-tile (skip granularity)
SPILL_RUN = 64        # max spilled nnz absorbed per extra row


class WindowEllOverflow(InvalidFormatError):
    """The packed layout would inflate memory beyond ``max_inflation`` —
    the structure is too adversarial for this kernel; callers fall back to
    the scalar path (mirrors the selector's role, C6)."""


def _pad_pow2(n: int, minimum: int = 1) -> int:
    n = max(n, minimum)
    return 1 << (n - 1).bit_length()


def _pad_geo(n: int, minimum: int = 8) -> int:
    """Round up to a x1.5 geometric bucket (bounds compiled-variant count
    like pow2 buckets but wastes <=33% instead of <=50% — and each wasted
    step costs ~400 ns of grid machinery)."""
    v = max(minimum, 8)
    while v < n:
        v = -(-v * 3 // 2)
    return v


def _cumcount(keys: np.ndarray) -> np.ndarray:
    """Occurrence index of each element within its key group (native hash
    pass when the C++ library is built; NumPy sort fallback otherwise)."""
    from ..native import cumcount

    return cumcount(keys)


def _unique_ic(keys: np.ndarray):
    """unique + inverse + counts (one native hash pass when available)."""
    from ..native import unique_inverse_counts

    return unique_inverse_counts(keys)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class WindowEllPlan:
    """Host-built packed layout for the window-ELL kernel.

    ``split_rows=None`` → vector-CSR semantics; ``split_rows=S`` →
    merge-path semantics (rows stride-split into ≤S-nnz extra rows).  In
    both modes over-deep cells spill to extra rows, and only the extras go
    through the final segment-sum combine — ordinary rows come straight out
    of the kernel's output block.
    """

    vals: jax.Array          # f32 (n_groups*8, 128)
    lo: jax.Array            # i8  (n_groups*8, 128)  col % 128 per slot
    sb: jax.Array            # i8  (n_groups*8, 128)  (row/128) % N_TB
    wg: jax.Array            # i32 (n_groups,)  x-window per group (SMEM)
    blk_step: jax.Array      # i32 (n_steps,)   HBM block per step
    sup_step: jax.Array      # i32 (n_steps,)   output superblock per step
    off_step: jax.Array      # i32 (n_steps,)   first live group in block
    cnt_step: jax.Array      # i32 (n_steps,)   live group count
    eoff_step: jax.Array     # i32 (n_steps,)   scratch row to finalize, -1
    extra_to_row: jax.Array  # i32 (n_extra,)   extra slot → original row
    num_rows: int
    num_cols: int
    extras_base: int         # first extra-row position (128-aligned)
    n_extra: int
    n_sup: int               # padded superblock count (pow2)
    e8: int                  # scratch rows for extras totals (pow2, ≥8)
    cols_pad: int
    step_groups: int
    split_rows: int | None
    occupancy: float

    def tree_flatten(self):
        leaves = (self.vals, self.lo, self.sb, self.wg, self.blk_step,
                  self.sup_step, self.off_step, self.cnt_step,
                  self.eoff_step, self.extra_to_row)
        # occupancy is diagnostic only — excluded from aux so it never
        # fragments the jit cache (plans reconstructed via pytree ops
        # report occupancy 0.0)
        aux = (self.num_rows, self.num_cols, self.extras_base, self.n_extra,
               self.n_sup, self.e8, self.cols_pad, self.step_groups,
               self.split_rows, 0.0)
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
              step_groups: int | None = None, cap_slack: int = 0,
              cap_margin: float = 0.3, spill_rounds: int = 1,
              max_inflation: float = 64.0,
              device=None) -> "WindowEllPlan":
        """Pack a host CSR matrix into the window-ELL layout (vectorized).

        Raises :class:`WindowEllOverflow` when padding would exceed
        ``max_inflation`` x nnz slots (plus a 4M-slot floor), signalling the
        caller to use the scalar kernel instead.
        """
        rows, nnz = csr.num_rows, csr.nnz
        cols_pad = _bucket(max(csr.num_cols, 1))
        n_windows = cols_pad // WINDOW
        if step_groups is None:
            # 128 saturates HBM on TPU; small steps keep interpret-mode
            # (CPU test) tracing cheap
            step_groups = 128 if not _use_interpret() else 8
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
        # SUP-aligned so extras superblocks never mix with row rows —
        # extras sups are processed FIRST and their totals written to the
        # VMEM scratch table that row-sup combine nonzeros gather from
        extras_base = -(-max(rows, 1) // SUP) * SUP

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

        # the gather table is x (cols_pad columns) followed by the extras
        # scratch region; combine nonzeros live beyond cols_pad, so windows
        # span ceil((cols_pad + extras)/WINDOW)
        def derive(pos, w, c):
            """Per-nnz lane / superblock / stacking layer within its cell
            (cell = (superblock, window, chunk, lane)) — fused native pass
            when the C++ library is built."""
            from ..native import plan_derive

            return plan_derive(pos, w, c, n_tab_windows, SUP)

        n_tab_windows = n_windows  # widened after extras are known
        lane, sup, layer = derive(pos, w, c)

        # ---- layer cap + spill to extra rows ----
        # One round caps the row region (measured best for power-law
        # matrices); extra rounds re-cap the extras region itself, which
        # can be enabled per matrix via ``spill_rounds``.
        n_extra = n_extra_split
        if nnz:
            for _round in range(max(spill_rounds, 1)):
                bw = sup * n_windows + w
                ubw, inv, cnt = _unique_ic(bw)
                # layer cap per bucket: ideal layers plus a relative margin
                # (additive slack wastes ~slack/ideal when buckets are
                # shallow; the relative margin keeps waste proportional)
                cap = np.maximum(
                    -(-(cnt + (cnt * cap_margin).astype(np.int64))
                      // (CHUNKS * LANE)),
                    -(-cnt // (CHUNKS * LANE))) + cap_slack
                spilled = layer >= cap[inv]
                if not spilled.any():
                    break
                # one extra row per (original row, ≤64-spill run).  Spills
                # are dealt ROUND-ROBIN across the row's extra rows so each
                # extra row's nonzeros stay spread over windows/chunks
                # (consecutive spills are consecutive columns; stacking 64
                # of them on one extra row would rebuild an 8-deep cell).
                rkey = row_of_nnz[spilled]
                occ_idx = _cumcount(rkey)
                u_r, inv_r, cnt_r = np.unique(rkey, return_inverse=True,
                                              return_counts=True)
                n_runs = -(-cnt_r // SPILL_RUN)
                run = occ_idx % n_runs[inv_r]
                big = int(run.max()) + 1
                skey = rkey * big + run
                su, sinv = np.unique(skey, return_inverse=True)
                pos = pos.copy()
                pos[spilled] = extras_base + n_extra + sinv
                extra_to_row = np.concatenate([extra_to_row, su // big])
                n_extra += len(su)
                lane, sup, layer = derive(pos, w, c)
        vals_src = csr.values
        extras_sup0 = extras_base // SUP
        # scratch rows: each extras superblock publishes a full N_TB-row
        # panel, so size by superblock count (pow2-bucketed to bound the
        # compiled-variant count)
        e8 = _pad_pow2(max(-(-n_extra // SUP), 1)) * N_TB
        if n_extra:
            # interleave extras by (occurrence-within-row, row): a row's
            # extras land at widely-spaced scratch columns, so the combine
            # nonzeros spread over windows/chunks instead of stacking one
            # cell deep
            k_within = _cumcount(extra_to_row)
            perm = np.lexsort((extra_to_row, k_within))
            inv_perm = np.empty(n_extra, np.int64)
            inv_perm[perm] = np.arange(n_extra, dtype=np.int64)
            is_extra = pos >= extras_base
            if is_extra.any():
                safe_idx = np.clip(pos - extras_base, 0, n_extra - 1)
                pos = np.where(is_extra, extras_base + inv_perm[safe_idx],
                               pos)
            extra_to_row = extra_to_row[perm]
            # fold the combine into the kernel: one synthetic nonzero per
            # extra row, value 1.0, column = scratch slot of that extra's
            # total (beyond cols_pad), target = the ORIGINAL row.  Row sups
            # gather extras totals from the VMEM scratch exactly like x.
            pos = np.concatenate([pos, extra_to_row])
            cols64 = np.concatenate(
                [cols64, cols_pad + np.arange(n_extra, dtype=np.int64)])
            vals_src = np.concatenate(
                [vals_src, np.ones(n_extra, np.float32)])
            row_of_nnz = np.concatenate([row_of_nnz, extra_to_row])
        n_tab_windows = n_windows + e8 // CHUNKS
        n_all = len(pos)
        if n_all:
            w = cols64 // WINDOW
            c = (cols64 // LANE) % CHUNKS
            lane, sup, layer = derive(pos, w, c)
            bw = sup * n_tab_windows + w
            ubw, inv, _ = _unique_ic(bw)
        else:
            ubw = np.zeros(0, np.int64)
            inv = np.zeros(0, np.int64)

        # ---- groups per (superblock, window) bucket ----
        # bucket order: extras superblocks FIRST (their totals must be in
        # scratch before row sups read them), then row superblocks
        lmax = np.zeros(len(ubw), np.int64)
        if n_all:
            np.maximum.at(lmax, inv, layer + 1)
        is_row_bucket = (ubw // n_tab_windows) < extras_sup0
        border = np.lexsort((ubw, is_row_bucket.astype(np.int64)))
        rank = np.empty(len(ubw), np.int64)
        rank[border] = np.arange(len(ubw), dtype=np.int64)
        ubw = ubw[border]
        lmax = lmax[border]
        inv = rank[inv]
        n_groups_real = int(lmax.sum())
        g_sup = np.repeat(ubw // n_tab_windows, lmax)
        g_w = np.repeat(ubw % n_tab_windows, lmax)
        total_pos = extras_base + n_extra
        n_sup_real = max(-(-max(total_pos, 1) // SUP), 1)
        n_sup = _pad_pow2(n_sup_real)

        # memory-blowup guard: the layer-cap spill absorbs adversarial
        # structure, so this only fires when the packed layout would still
        # be both large in absolute terms (> 4M slots = 24 MB) and heavily
        # inflated relative to nnz
        slots = max(n_groups_real, 1) * CHUNKS * LANE
        if nnz and slots > max_inflation * nnz and slots > (1 << 22):
            raise WindowEllOverflow(
                f"window-ELL padding {slots} slots for {nnz} nnz "
                f"(inflation {slots / nnz:.1f}x > {max_inflation}x)")
        # the per-group window index is scalar-prefetched into SMEM (~1 MB);
        # refuse plans whose prefetch would not fit (the flat path handles
        # such matrices; healthy-occupancy plans stay far below this)
        if n_groups_real > 180_000:
            raise WindowEllOverflow(
                f"window-ELL plan needs {n_groups_real} groups; the "
                f"per-group window table would exceed SMEM")

        # groups are already ordered by (sup, w, layer); nnz → group index
        group_start = np.zeros(len(ubw), np.int64)
        if len(ubw):
            np.cumsum(lmax[:-1], out=group_start[1:])

        # ---- steps: one per (superblock, HBM block) pair ----
        n_blocks = max(-(-n_groups_real // S), 1)
        # group range per superblock (empty sups get an empty range)
        sup_first = np.zeros(n_sup_real, np.int64)
        sup_count = np.zeros(n_sup_real, np.int64)
        if len(g_sup):
            uq, first, count = np.unique(g_sup, return_index=True,
                                         return_counts=True)
            sup_first[uq] = first
            sup_count[uq] = count
        blk_l, sup_l, off_l, cnt_l, eoff_l = [], [], [], [], []
        prev_blk = 0
        # extras sups first (finalized into scratch), then row sups
        sup_iter = list(range(extras_sup0, n_sup_real)) + \
            list(range(0, min(extras_sup0, n_sup_real)))
        for s_id in sup_iter:
            a = int(sup_first[s_id])
            b = a + int(sup_count[s_id])
            is_extras_sup = s_id >= extras_sup0
            fin = (s_id - extras_sup0) * N_TB if is_extras_sup else -1
            if b == a:
                # empty superblock: one no-work step to zero its output
                blk_l.append(prev_blk)
                sup_l.append(s_id)
                off_l.append(0)
                cnt_l.append(0)
                eoff_l.append(fin)
                continue
            for bidx in range(a // S, (b - 1) // S + 1):
                lo_g = max(a, bidx * S)
                hi_g = min(b, (bidx + 1) * S)
                blk_l.append(bidx)
                sup_l.append(s_id)
                off_l.append(lo_g - bidx * S)
                cnt_l.append(hi_g - lo_g)
                eoff_l.append(-1)
                prev_blk = bidx
            eoff_l[-1] = fin  # finalize scratch on the sup's last step
        n_steps = len(blk_l)
        n_steps_pad = _pad_geo(n_steps)
        # pad steps repeat the last real step with cnt=0: same sup (no
        # re-zeroing of live output), same block (no DMA), no finalize
        blk_l += [blk_l[-1]] * (n_steps_pad - n_steps)
        sup_l += [sup_l[-1]] * (n_steps_pad - n_steps)
        off_l += [0] * (n_steps_pad - n_steps)
        cnt_l += [0] * (n_steps_pad - n_steps)
        eoff_l += [-1] * (n_steps_pad - n_steps)

        n_groups_pad = n_blocks * S
        vals = np.zeros((n_groups_pad * CHUNKS, LANE), np.float32)
        lo = np.zeros((n_groups_pad * CHUNKS, LANE), np.int8)
        sb = np.zeros((n_groups_pad * CHUNKS, LANE), np.int8)
        wg_arr = np.zeros(n_groups_pad, np.int64)
        if len(g_w):
            wg_arr[: n_groups_real] = g_w
        if n_all:
            from ..native import fill_slots

            group_of_nnz = group_start[inv] + layer
            flat = group_of_nnz * (CHUNKS * LANE) + c * LANE + lane
            fill_slots(flat, vals_src, cols64 % LANE, (pos // LANE) % N_TB,
                       vals, lo, sb)

        put = (lambda a: jax.device_put(a, device)) if device is not None \
            else jax.device_put
        return WindowEllPlan(
            vals=put(jnp.asarray(vals)),
            lo=put(jnp.asarray(lo)),
            sb=put(jnp.asarray(sb)),
            wg=put(jnp.asarray(wg_arr.astype(np.int32))),
            blk_step=put(jnp.asarray(np.asarray(blk_l, np.int32))),
            sup_step=put(jnp.asarray(np.asarray(sup_l, np.int32))),
            off_step=put(jnp.asarray(np.asarray(off_l, np.int32))),
            cnt_step=put(jnp.asarray(np.asarray(cnt_l, np.int32))),
            eoff_step=put(jnp.asarray(np.asarray(eoff_l, np.int32))),
            extra_to_row=put(jnp.asarray(extra_to_row.astype(np.int32))),
            num_rows=rows,
            num_cols=csr.num_cols,
            extras_base=int(extras_base),
            n_extra=int(n_extra),
            n_sup=int(n_sup),
            e8=int(e8),
            cols_pad=cols_pad,
            step_groups=S,
            split_rows=split_rows,
            occupancy=float(nnz / slots) if slots else 0.0,
        )


def _use_interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


@functools.lru_cache(maxsize=64)
def _build_pallas(n_steps: int, S: int, n_sup: int, cols8: int, e8: int,
                  interpret: bool):
    T = min(T_SUB, S)
    OB = max(8, N_TB)  # out block rows (min f32 tile is (8,128))

    def kernel(wg_ref, blk_ref, sup_ref, off_ref, cnt_ref, eoff_ref,
               x_ref, v_ref, lo_ref, sb_ref, o_ref, tab_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            # gather table = x followed by the extras-totals scratch
            tab_ref[0:cols8, :] = x_ref[:]

        @pl.when(jnp.logical_or(
            i == 0, sup_ref[i] != sup_ref[jnp.maximum(i - 1, 0)]))
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        off_i = off_ref[i]
        end_i = off_i + cnt_ref[i]
        gbase = blk_ref[i] * S
        # group index of every slot row in a sub-tile, for edge masking
        g_iota = jax.lax.broadcasted_iota(jnp.int32, (T * 8, LANE), 0) // 8

        # iterate ONLY the live sub-tiles [off, off+cnt) — a dynamic-bound
        # loop costs scalar-core work per live sub-tile instead of a
        # pl.when ladder costing it for every sub-tile of every step
        def body(q, carry):
            qs = pl.multiple_of(q * T * 8, T * 8)
            lo_q = lo_ref[pl.ds(qs, T * 8), :].astype(jnp.int32)
            v_q = v_ref[pl.ds(qs, T * 8), :]
            # int32 for the target compares: v5e rejects i8 vector compares
            sb_q = sb_ref[pl.ds(qs, T * 8), :].astype(jnp.int32)
            prods = []
            for t in range(T):
                wdw = wg_ref[gbase + q * T + t]
                table = tab_ref[
                    pl.ds(pl.multiple_of(wdw * CHUNKS, CHUNKS), CHUNKS),
                    :]
                g = jnp.take_along_axis(table, lo_q[8 * t:8 * t + 8, :],
                                        axis=1)
                prods.append(v_q[8 * t:8 * t + 8, :] * g)
            prod = jnp.concatenate(prods, axis=0)
            gq = g_iota + q * T
            live = jnp.logical_and(gq >= off_i, gq < end_i)
            prod = jnp.where(live, prod, 0.0)
            rows_acc = [jnp.sum(jnp.where(sb_q == t, prod, 0.0), axis=0,
                                keepdims=True) for t in range(N_TB)]
            if N_TB < 8:
                rows_acc.append(jnp.zeros((8 - N_TB, LANE), jnp.float32))
            o_ref[:] = o_ref[:] + jnp.concatenate(rows_acc, axis=0)
            return carry

        @pl.when(cnt_ref[i] > 0)
        def _():
            jax.lax.fori_loop(off_i // T, (end_i + T - 1) // T, body, 0)

        # extras superblock finished: publish its totals into the scratch
        # so later row-sup combine nonzeros can gather them like x
        @pl.when(eoff_ref[i] >= 0)
        def _():
            dst = pl.multiple_of(cols8 + eoff_ref[i], 8)
            tab_ref[pl.ds(dst, N_TB), :] = o_ref[0:N_TB, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((cols8, LANE), lambda i, *m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S * 8, LANE), lambda i, wg, blk, *m: (blk[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S * 8, LANE), lambda i, wg, blk, *m: (blk[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S * 8, LANE), lambda i, wg, blk, *m: (blk[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((OB, LANE),
                               lambda i, wg, blk, sup, *m: (sup[i], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((cols8 + e8, LANE), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_sup * OB, LANE), jnp.float32),
        interpret=interpret,
    )


@jax.jit
def spmv_window_ell(plan: WindowEllPlan, x: jax.Array) -> jax.Array:
    """``y = A @ x`` via the window-ELL plan.  ``x`` is the unpadded operand
    (``num_cols``,); returns ``(num_rows,)``.  The extras combine runs
    inside the kernel (scratch fold) — no host-side scatter remains."""
    x = jnp.asarray(x, jnp.float32)
    x_pad = jnp.pad(x, (0, plan.cols_pad - x.shape[0]))
    x2d = x_pad.reshape(plan.cols_pad // LANE, LANE)
    fn = _build_pallas(plan.n_steps, plan.step_groups, plan.n_sup,
                       plan.cols_pad // LANE, plan.e8, _use_interpret())
    out = fn(plan.wg, plan.blk_step, plan.sup_step, plan.off_step,
             plan.cnt_step, plan.eoff_step, x2d, plan.vals, plan.lo,
             plan.sb)
    # keep the N_TB live rows of each out block; drop the pad rows
    OB = max(8, N_TB)
    y_flat = out.reshape(plan.n_sup, OB, LANE)[:, :N_TB, :].reshape(-1)
    return y_flat[: plan.num_rows]
