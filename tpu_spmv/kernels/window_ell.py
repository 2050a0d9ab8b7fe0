"""Window-ELL Pallas kernel v2 — the fast CSR paths (C8 vector + C9 merge-path).

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
  ``row ≡ l (mod 128)`` within the group's *superblock* of ``sup`` rows
  (sup ∈ {1024, 4096, 16384}, cost-model-selected per matrix).  The row
  sub-block (``(row/128) % (sup/128)``) is stored **per slot** as int8
  (``sb``), so nonzeros stack densely: the packing cell is
  ``(superblock, window, chunk, lane)`` and cells stack layers
  independently — per-slot ``sb`` is what buys dense occupancy over a
  block-ELL layout (~6-10x fewer padded slots on power-law matrices).
* per-nnz streamed bytes: 4 (f32 value) + 1 (int8 lane index) + 1 (int8
  sub-block) = 6, vs the reference byte model's 8 (f32 value + i32 column).

v2 kernel architecture (round 2 — halves the scatter cost and removes the
per-superblock grid machinery of round 1):

* **The whole output lives in a VMEM-resident block** ``(out8, 128)`` for
  the entire kernel: row position ``p`` sits at (sublane ``p//128``, lane
  ``p%128``).  Real rows occupy positions ``[0, num_rows)``; extra rows
  (split/spill targets) occupy positions ``[extras_base, ...)`` after them.
* **Grid steps are HBM blocks** (``step_groups`` groups each), nothing
  else: no per-superblock steps, no live-range bookkeeping.  A step
  processes all its groups in sub-tiles of ``T_SUB``; each run of ``tb``
  consecutive groups (the plan's scatter-run length, default ``T_BASE``)
  shares a *scatter base* (the superblock's first sublane,
  scalar-prefetched), and the sub-tile's products are folded by
  ``sup/128`` masked sublane-sums and added into the output block at the
  dynamic base — one (sup/128, 128) read-modify-write per ``tb``
  groups.  Group runs are padded to ``tb`` with zero-valued
  slots at plan time (measured ~6% on the 10M-nnz headline).  At the
  narrow sup the 8 targets cost ~11 ps/slot on v5e (round 1's 16-target
  design: ~24); wide superblocks trade linear scatter cost for packing
  density on sparse-wide structure (see ``SUP_LEVELS``).
* **Extras groups run first** (they sit in the leading HBM blocks, each
  extras level padded to a block boundary); a between-steps copy
  publishes their totals into the extras region of the gather block
  (``x_ref`` carries x ++ extras-totals; Pallas input blocks are mutable
  VMEM fetched once under a constant index map), in TWO levels: each
  original row's extras fold into one level-2 extra, and the row region
  carries a single unit-valued *combine* nonzero per row that gathers the
  level-2 total exactly like an x entry — the split/spill reduction
  happens inside the kernel, deterministically, with no atomics and no
  host-side scatter (the determinism contract the reference's merge-path
  atomicAdd lacks, ``spmv_kernels.cu:116,128``).
"""

from __future__ import annotations

import dataclasses
import functools
import os

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
SUP = 1024            # default rows per superblock (narrow mode)
# Candidate superblock heights.  Wider superblocks trade masked-sum
# scatter targets (sup/128 of them) for packing density — on matrices
# whose (1024-row x 1024-col) tiles hold only a handful of nonzeros
# (wide sparse web graphs), a 16384-row superblock keeps cells populated
# while the measured scatter cost (~0.3 ps/slot per target on v5e) stays
# proportional, so cost-per-nnz is roughly target-count-invariant.
SUP_LEVELS = (1024, 4096, 16384)
T_SUB = 16            # groups per compute sub-tile
# Groups sharing one scatter base (the plan's scatter-RUN length).
# Every run pads to T_BASE groups with zero slots, so the per-superblock
# padding expectation is (T_BASE-1)/2 groups — measured 1638 empty
# groups (10.7% of streamed bytes) on the 10M-nnz leveled headline at
# T_BASE=8 (round 4, /tmp/pad_probe).  Shorter runs buy padding back at
# the cost of more (n_tb,128) output RMWs per sub-tile (2 at 8, 4 at 4,
# 8 at 2 — the ind8u probe priced 16 arbitrary RMWs/tile at +0.55
# ps/slot, docs/PERF.md).  The plan carries its run length (``tb``) so
# kernels and layouts stay paired; builders resolve ``t_base=None``
# here (env ``TPU_SPMV_T_BASE`` for A/Bs).  Legal values: 2, 4, 8
# (the nibble-packed sb reassembly indexes group parity by t%2, which
# requires an even run length; 8 is the measured default — the round-5
# device A/B of shorter runs LOST despite streaming 5-8% fewer groups:
# the doubled/quadrupled per-run output read-modify-writes cost ~8%
# on the 10M-nnz headline, docs/AB_TBASE_r05.txt).
T_BASE = 8
SPILL_RUN = 64        # max spilled nnz absorbed per extra row

# VMEM budget for (x ++ extras gather block + output block +
# double-buffered packed blocks); ~16 MB/core on v5e minus headroom.
VMEM_BUDGET = 13 * (1 << 20)
# SMEM budget for the per-group scalar-prefetch tables.
MAX_GROUPS = 180_000

# cost-model constants for superblock selection (measured, v5e):
# HBM stream ~8.3 ps/slot; masked-sum scatter per slot by target count.
_STREAM_PS = 8.3
_SCATTER_PS = {1024: 2.3, 4096: 14.8, 16384: 69.0}   # per sup level
# the builder defaults build_auto passes and _choose_sup's cost model
# mirrors (the model is only calibrated while it matches the builder) —
# retune them HERE only.  Narrow superblocks re-tuned with the round-3
# atom-aware slot balancer (TPU_SPMV_BALANCE_LAYER=2, window 2):
# beta=2.2/slack=0 measures 17152 groups on the 10M-nnz headline vs
# 17664 at 2.6/1 (benchmarks/extras_headroom.py sweep); the wide
# defaults stay at 2.6/1 pending the on-device wide A/B.
AUTO_SPILL_BETA = 2.6
AUTO_CAP_SLACK = 1
AUTO_SPILL_BETA_NARROW = 2.2
AUTO_CAP_SLACK_NARROW = 0
# dispatch default for within-superblock row→lane leveling (build_auto
# permute_rows=None resolves here; env override for A/Bs).  Flipped ON
# by the round-4 on-device A/B (ab_device, 2026-08-19, real v5e, paired
# in-session with lever-engagement asserts): leveled 15360-group plan
# 127.7 µs vs best natural 17664-group plan 142.9 µs at S=384 (−10.6%,
# consistent with the −13% group count net of the ~12 B/row unpermute
# stream); at S=128 leveled 148.1 vs natural 153.8-158.9.  The inverse
# lane-gather pass compiles and verifies on hardware.
PERMUTE_ROWS_DEFAULT = True


def _t_base(t_base: int | None) -> int:
    """Resolve a builder's scatter-run length (see ``T_BASE``)."""
    if t_base is None:
        env = os.environ.get("TPU_SPMV_T_BASE")
        try:
            t_base = T_BASE if env is None else int(env)
        except ValueError:
            raise InvalidFormatError(
                f"TPU_SPMV_T_BASE must be an integer (2, 4 or 8); "
                f"got {env!r}") from None
    if t_base not in (2, 4, 8):
        raise InvalidFormatError(
            f"t_base must be 2, 4 or 8 (got {t_base})")
    return t_base


def _permute_default() -> bool:
    env = os.environ.get("TPU_SPMV_PERMUTE_ROWS")
    if env is not None:
        return env not in ("0", "")
    return PERMUTE_ROWS_DEFAULT


# rows with K <= bypass_k extras skip the level-2 combine and gather
# their level-1 totals directly (K=1 is the round-3 singles bypass).
# K=2 MEASURED NET-ZERO on the 10M-nnz leveled headline (15104 both
# ways: the L2 section shrinks one 128-group quantum but the 8202
# direct gather cells open/raise rows-region (sup, table-window)
# buckets by the same amount) and −128 WORSE on the 262K web graph;
# K>=3 is worse still (15488/16384 headline).  The combine split is at
# a measured local optimum at K=1.  Env override: TPU_SPMV_BYPASS_K.
BYPASS_K_DEFAULT = 1


def _bypass_k() -> int:
    env = os.environ.get("TPU_SPMV_BYPASS_K")
    return int(env) if env else BYPASS_K_DEFAULT


def _auto_caps(sup: int) -> tuple:
    """(spill_beta, cap_slack) defaults per superblock height — shared
    by ``build``/``build_auto`` and ``_choose_sup`` so the cost model
    stays calibrated against the builder it mirrors."""
    if sup == SUP_LEVELS[0]:
        return AUTO_SPILL_BETA_NARROW, AUTO_CAP_SLACK_NARROW
    return AUTO_SPILL_BETA, AUTO_CAP_SLACK


class WindowEllOverflow(InvalidFormatError):
    """The packed layout would not fit (VMEM/SMEM/inflation guards) —
    the structure is too adversarial for this kernel; callers fall back to
    the streaming path (mirrors the selector's role, C6)."""


def _pad_pow2(n: int, minimum: int = 1) -> int:
    n = max(n, minimum)
    return 1 << (n - 1).bit_length()


def _pad_geo(n: int, minimum: int = 8) -> int:
    """Round up to a x1.5 geometric bucket (bounds compiled-variant count
    like pow2 buckets but wastes <=33% instead of <=50%)."""
    v = max(minimum, 1)
    while v < n:
        v = -(-v * 3 // 2)
    return v


def _cumcount(keys: np.ndarray) -> np.ndarray:
    """Occurrence index of each element within its key group (native hash
    pass when the C++ library is built; NumPy sort fallback otherwise)."""
    from ..native import cumcount

    return cumcount(keys)


def _beta_caps(cb: np.ndarray, dcount: np.ndarray, n_buckets: int,
               spill_beta: float, cap_slack: int) -> np.ndarray:
    """Order-statistic spill caps: per-bucket layer cap = depth of the
    k-th deepest cell, k the smallest cell count that justifies keeping
    a layer at ~``spill_beta`` extras slots per spilled nonzero, plus
    ``cap_slack``.  ``cb``/``dcount`` are the bucket id and depth of
    each occupied cell.  Shared by the builder (``_build``) and the
    cost model (``_choose_sup``) so the two cannot drift."""
    k = int(CHUNKS * LANE / spill_beta) + 1
    order = np.lexsort((-dcount, cb))
    kth = _cumcount(cb[order]) == (k - 1)
    cap = np.zeros(n_buckets, np.int64)
    cap[cb[order][kth]] = dcount[order][kth]
    return cap + cap_slack


def _unique_ic(keys: np.ndarray):
    """unique + inverse + counts (one native hash pass when available)."""
    from ..native import unique_inverse_counts

    return unique_inverse_counts(keys)


def _level_rows(csr: CSRMatrix, sup_rows: int, split_rows):
    """Within-superblock row→lane leveling (``permute_rows=True``).

    Rows of each 128-row tile are reassigned to distinct lanes by the
    native greedy (:func:`tpu_spmv.native.balance_row_tiles`) so
    per-(window, chunk, lane) cell depths level within every superblock
    — the same atom-aware layer cost as the extras slot balancer, now
    applied to the ROW region (measured on the 10M-nnz power-law
    headline: 17152 → 15488 groups; 262K web graph at sup=4096:
    39552 → ~32.5K).  Because the permutation is per-tile, the inverse
    is ONE lane gather on the (tiles, 128) output block
    (:func:`_unpermute_tiles`) — the public y-order contract holds.

    Returns ``(lam, permuted_csr)`` where ``lam[t, j]`` is the permuted
    lane holding original row ``t*128 + j`` (int32, identity in the
    padded tail), or ``(None, csr)`` when the native library is absent
    or ``TPU_SPMV_NO_BALANCE`` is set (callers keep natural order).
    """
    from ..native import balance_row_tiles

    rows, nnz = csr.num_rows, csr.nnz
    row_len = np.diff(csr.row_ptrs).astype(np.int64)
    parts = np.maximum(-(-row_len // split_rows), 1) if split_rows \
        else None
    # wc = global chunk id (window * CHUNKS + chunk) = col // LANE
    wc = csr.col_indices.astype(np.int64) // LANE
    n_wc = _bucket(max(csr.num_cols, 1)) // LANE
    lanes = balance_row_tiles(csr.row_ptrs, wc, n_wc, sup_rows, parts)
    if lanes is None:
        return None, csr
    new_of_old = (np.arange(rows, dtype=np.int64) // LANE) * LANE + lanes
    old_of_new = np.empty(rows, np.int64)
    old_of_new[new_of_old] = np.arange(rows, dtype=np.int64)
    new_len = row_len[old_of_new]
    new_ptr64 = np.zeros(rows + 1, np.int64)
    np.cumsum(new_len, out=new_ptr64[1:])
    # per-nnz gather: new row i's slice comes from old row old_of_new[i]
    gat = np.repeat(csr.row_ptrs[old_of_new].astype(np.int64)
                    - new_ptr64[:-1], new_len) \
        + np.arange(nnz, dtype=np.int64)
    perm_csr = CSRMatrix(rows, csr.num_cols, csr.values[gat],
                         csr.col_indices[gat],
                         new_ptr64.astype(csr.row_ptrs.dtype))
    n_tiles = -(-rows // LANE)
    # pad tiles so the unpermute kernel's block height divides evenly
    t_u = min(512, _pad_pow2(n_tiles, minimum=8))
    n_tiles_pad = -(-n_tiles // t_u) * t_u
    lam = np.tile(np.arange(LANE, dtype=np.int32), (n_tiles_pad, 1))
    lam.reshape(-1)[:rows] = lanes.astype(np.int32)
    return lam, perm_csr


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class WindowEllPlan:
    """Host-built packed layout for the window-ELL kernel.

    ``split_rows=None`` → vector-CSR semantics; ``split_rows=S`` →
    merge-path semantics (rows stride-split into ≤S-nnz extra rows).  In
    both modes over-deep cells spill to extra rows, and only the extras go
    through the in-kernel combine — ordinary rows come straight out of the
    kernel's output block.
    """

    vals: jax.Array          # f32 — or bf16 under ``values_dtype``, the
    #   opt-in half-width value stream (5.5 → 3.5 B/slot; products
    #   convert to f32 in-kernel, accumulation stays f32; ~4e-3 rel
    #   value error) — (n_groups_pad*8, 128); None for
    #   PATTERN plans (``pat``): every stored nonzero is implicitly 1.0
    #   and the vals stream is not uploaded or read at all — per-slot
    #   stream drops 5.5 -> 1.5 B.  Pad slots, which zero values would
    #   otherwise mask, carry the sentinel sub-block -1 instead (no
    #   masked-sum target matches, so their gathered garbage is dropped)
    lo: jax.Array            # i8  (n_groups_pad*8, 128)  col % 128 per slot
    sb: jax.Array            # i8  (pos/128)%(sup/128) per slot; when
    #   ``sbn`` the stream is nibble-packed ACROSS GROUP PAIRS — groups
    #   2t (low nibble) and 2t+1 (high) share one (8,128) int8 vreg, so
    #   the array is (n_groups_pad*4, 128) and the per-slot stream drops
    #   6 -> 5.5 B (measured 9.20 -> 8.77 ps/slot on v5e; the round-2
    #   WITHIN-group pairing needed 4-row slices and blew Mosaic compile
    #   15x, cross-group pairing compiles in seconds)
    wg: jax.Array            # i32 (n_groups_pad,)  x-window per group (SMEM)
    base: jax.Array          # i32 (n_groups_pad/tb,) superblock per run
    blk_step: jax.Array      # i32 (n_steps,) HBM block per step, -1 = pad
    fin_step: jax.Array      # i32 (n_steps,) 1 = copy extras totals first
    extra_to_row: jax.Array  # i32 (n_extra,)  extra slot → original row
    num_rows: int
    num_cols: int
    extras_base: int         # first extra-row position (sup-aligned)
    n_extra: int
    e8: int                  # gather-table sublanes for extras totals
    out8: int                # output block sublanes (rows ++ extras)
    cols_pad: int
    step_groups: int
    split_rows: int | None
    sup: int                 # rows per superblock (scatter targets = sup/128)
    occupancy: float
    sbn: bool = False        # sb stream nibble-packed across group pairs
    pat: bool = False        # pattern plan: implicit unit values (see vals)
    tb: int = T_BASE         # scatter-run length: groups sharing one base
    #   (layout and kernel fold granularity are paired through this)
    lam: object = None       # i32 (ceil(rows/128), 128) per-tile source
    #   lane when the plan was built with ``permute_rows=True`` (rows
    #   leveled onto lanes within each superblock; the kernel output is
    #   in leveled order and ``_unpermute_rows`` restores row order with
    #   one take_along_axis lane gather) — None for natural-order plans

    def tree_flatten(self):
        leaves = (self.vals, self.lo, self.sb, self.wg, self.base,
                  self.blk_step, self.fin_step, self.extra_to_row,
                  self.lam)
        # occupancy is diagnostic only — excluded from aux so it never
        # fragments the jit cache (plans reconstructed via pytree ops
        # report occupancy 0.0)
        aux = (self.num_rows, self.num_cols, self.extras_base, self.n_extra,
               self.e8, self.out8, self.cols_pad, self.step_groups,
               self.split_rows, self.sup, 0.0, self.sbn, self.pat, self.tb)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves[:-1], *aux, leaves[-1])

    @property
    def n_groups(self) -> int:
        return int(self.wg.shape[0])

    @property
    def n_steps(self) -> int:
        return int(self.blk_step.shape[0])

    @property
    def stream_bytes(self) -> float:
        """Actual bytes one kernel invocation streams from HBM (packed
        slot arrays + gather/output tables + the unpermute pass) — the
        physics-guard denominator for benchmark readings."""
        per_slot = (0.0 if self.pat
                    else float(np.dtype(self.vals.dtype).itemsize)) + 1.0 \
            + (0.5 if self.sbn else 1.0)
        b = self.n_groups * CHUNKS * LANE * per_slot \
            + (self.cols_pad + (self.e8 + self.out8) * LANE) * 4
        if self.lam is not None:
            b += int(np.prod(self.lam.shape)) * 12  # read y+lam, write y
        return b

    def to_device(self, device) -> "WindowEllPlan":
        """Copy of the plan with every array leaf on ``device`` (host
        plans built with ``device=cpu`` upload this way; ``lam`` may be
        ``None`` and is carried through)."""
        from ..errors import guarded_device_put

        leaves, aux = self.tree_flatten()
        moved = tuple(a if a is None
                      else guarded_device_put(np.asarray(a), device)
                      for a in leaves)
        return WindowEllPlan.tree_unflatten(aux, moved)

    def save(self, path: str) -> None:
        """Persist the built plan (see :mod:`tpu_spmv.plan_io`)."""
        from ..plan_io import save_plan

        save_plan(self, path)

    @staticmethod
    def load(path: str, device=None) -> "WindowEllPlan":
        from ..plan_io import load_plan

        plan = load_plan(path, device)
        if not isinstance(plan, WindowEllPlan):
            raise InvalidFormatError(
                f"{path}: holds a {type(plan).__name__}, not a WindowEllPlan")
        return plan

    @staticmethod
    def autotune(csr: CSRMatrix, x=None, split_rows: int | None = 128,
                 widths: tuple = (128, 384), iters: int = 200,
                 permute_rows: bool = False) -> "WindowEllPlan":
        """Build candidate plans at several step widths, measure each on
        the live device, and return the fastest.

        The optimal ``step_groups`` depends on device state (measured on
        v5e: S=128 wins a "fast" HBM session at ~152 us on the 10M-nnz
        headline, but degrades ~18% in the "slow" session state where
        S=384's larger blocks hold ~155 us — see docs/PERF.md).  For
        long-lived serving processes the measurement cost (~1 s per
        candidate) amortizes immediately.
        """
        import jax.numpy as jnp

        from ..timing import time_jitted

        if x is None:
            x = jnp.zeros((csr.num_cols,), jnp.float32)
        else:
            x = jnp.asarray(x, jnp.float32)
        best = None
        for S in widths:
            plan = WindowEllPlan.build(csr, split_rows=split_rows,
                                       step_groups=S,
                                       permute_rows=permute_rows)
            secs = time_jitted(spmv_window_ell, plan, x, iters=iters,
                               samples=3, estimator="median")
            if best is None or secs < best[0]:
                best = (secs, plan)
        return best[1]

    @staticmethod
    def build(csr: CSRMatrix, split_rows: int | None = None,
              step_groups: int | None = None, cap_slack: int | None = None,
              cap_margin: float = 0.3, spill_rounds: int = 1,
              max_inflation: float = 64.0, sup: int | None = None,
              spill_beta: float | None = None, device=None,
              permute_rows: bool = False,
              pattern: bool = False,
              values_dtype=np.float32,
              t_base: int | None = None) -> "WindowEllPlan":
        """Pack a host CSR matrix into the window-ELL layout (vectorized).

        ``pattern=True`` builds a PATTERN plan: ``csr.values`` are
        ignored, every stored nonzero acts as 1.0, and the f32 vals
        stream is dropped entirely (5.5 → 1.5 B/slot streamed; pad
        slots are masked by a sentinel sub-block instead of zero
        values).  ``y = B @ x`` for the 0/1 structure B; callers with
        column-scaled matrices ``A = B·diag(s)`` pre-scale x
        (``A @ x = B @ (s*x)`` — same products, same fold order).

        ``sup=None`` picks the superblock height by the measured cost
        model (see :func:`_choose_sup`) and escalates to wider superblocks
        if the chosen one trips a guard.  Raises
        :class:`WindowEllOverflow` when no layout fits, signalling the
        caller to use the streaming path instead.

        ``spill_beta=None`` / ``cap_slack=None`` resolve to the measured
        per-height defaults (:func:`_auto_caps`: beta=2.2/slack=0 for
        narrow sup=1024 plans with the atom-aware slot balancer; the
        legacy ``cap_margin`` caps with slack 1 for wide superblocks) —
        per-bucket order-statistic layer caps price a kept layer against
        ~beta extras slots per spilled nonzero.  ``spill_beta=0`` forces
        the legacy caps.
        """
        if sup is not None:
            slack = cap_slack if cap_slack is not None \
                else _auto_caps(sup)[1]
            return WindowEllPlan._build(
                csr, split_rows, step_groups, slack, cap_margin,
                spill_rounds, max_inflation, sup, spill_beta, device,
                permute_rows, pattern, values_dtype, t_base)
        start = _choose_sup(csr, split_rows=split_rows)
        err = None
        for s in SUP_LEVELS[SUP_LEVELS.index(start):]:
            # wide superblocks are shallow (cap ~1); without extra slack
            # the spill mass becomes per-row extras that blow the VMEM
            # extras table, so trade a little occupancy for bounded spills
            base = cap_slack if cap_slack is not None \
                else _auto_caps(s)[1]
            slack = max(base, 2) if s >= 4096 else base
            try:
                return WindowEllPlan._build(
                    csr, split_rows, step_groups, slack, cap_margin,
                    spill_rounds, max_inflation, s, spill_beta, device,
                    permute_rows, pattern, values_dtype, t_base)
            except WindowEllOverflow as e:
                err = e
        raise err

    @staticmethod
    def _build(csr: CSRMatrix, split_rows, step_groups, cap_slack,
               cap_margin, spill_rounds, max_inflation, sup, spill_beta,
               device, permute_rows: bool = False,
               pattern: bool = False,
               values_dtype=np.float32,
               t_base: int | None = None) -> "WindowEllPlan":
        sup_rows = sup           # scalar superblock height; ``sup`` below
        del sup                  # is reused for per-nnz superblock ids
        tb = _t_base(t_base)
        if spill_beta is None:
            # Measured default (benchmarks/sweep_caps.py +
            # extras_headroom.py, 10M-nnz power-law headline): order-
            # statistic caps cut total groups vs the flat-margin caps at
            # sup=1024 (18688 -> 17664 at beta=2.6/slack=1 with the slot
            # balancer; 17152 at beta=2.2/slack=0 with the atom-aware
            # scorer).  Wide superblocks are shallow (cap ~1) and
            # unmeasured under beta via this entry — keep the legacy
            # margin caps there (build_auto passes beta explicitly).
            # Pass spill_beta=0 to force the legacy caps at any height.
            spill_beta = AUTO_SPILL_BETA_NARROW \
                if sup_rows == SUP_LEVELS[0] else 0.0
        n_tb = sup_rows // LANE
        rows, nnz = csr.num_rows, csr.nnz
        cols_pad = _bucket(max(csr.num_cols, 1))
        n_windows = cols_pad // WINDOW
        if step_groups is None:
            # 256 is the robust single default on v5e (round 3): the
            # chip's per-session throughput state flips the optimum —
            # S=128 wins fast sessions (152 us on the headline) but
            # degrades to ~181 us in the slow state, while S=256 holds
            # 160-164 us in BOTH states.  Peak-chasing callers use
            # WindowEllPlan.autotune (or bench.py's dual-plan measure).
            # Small steps keep interpret-mode (CPU test) tracing cheap.
            if _use_interpret():
                step_groups = 8
            else:
                # wide superblocks are fori-path and scatter-bound —
                # keep their smaller blocks for VMEM headroom
                step_groups = 128 if sup_rows >= 4096 else 256
        # Normalize to a kernel-legal step width: the sub-tile loop runs
        # S // T_SUB full tiles and each tile folds T_SUB // T_BASE base
        # runs, so any S that is neither 8 nor a multiple of T_SUB would
        # leave trailing groups unprocessed (silently wrong results for
        # e.g. SpMVConfig(block_size=24) -> step_groups=12).  Rounding up
        # is always safe: blocks are padded to S groups with zero slots.
        step_groups = T_BASE if step_groups <= T_BASE \
            else -(-step_groups // T_SUB) * T_SUB
        S = step_groups
        lam_arr = None
        if permute_rows and nnz and rows > 1:
            # within-superblock row→lane leveling: build on the permuted
            # matrix; the plan carries the per-tile inverse (lam) and the
            # dispatch restores row order with one lane gather
            lam_arr, csr = _level_rows(csr, sup_rows, split_rows)
        row_len = np.diff(csr.row_ptrs).astype(np.int64)
        if nnz:
            row_of_nnz = np.repeat(np.arange(rows, dtype=np.int64), row_len)
            cols64 = csr.col_indices.astype(np.int64)
            w = cols64 // WINDOW
            c = (cols64 // LANE) % CHUNKS
        else:
            row_of_nnz = cols64 = w = c = np.zeros(0, np.int64)

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
        # extra rows live after the real rows, SUP-aligned, in a
        # geometrically-bucketed position space (bounds kernel variants)
        extras_base = _pad_geo(-(-max(rows, 1) // sup_rows), minimum=1) \
            * sup_rows

        if nnz:
            from ..native import plan_positions

            # fused native walk (one pass) — the NumPy formulation costs
            # three variable-count repeats (~6 s at 10M nnz on one core)
            pos, _ = plan_positions(csr.row_ptrs, parts, extra_base_of_row,
                                    extras_base)
        else:
            pos = np.zeros(0, np.int64)

        # the gather table is x (cols_pad columns) followed by the extras
        # scratch region; combine nonzeros live beyond cols_pad, so windows
        # span ceil((cols_pad + extras)/WINDOW)
        def derive(pos, w, c):
            """Per-nnz lane / superblock / stacking layer within its cell
            (cell = (superblock, window, chunk, lane)) — fused native pass
            when the C++ library is built."""
            from ..native import plan_derive

            return plan_derive(pos, w, c, n_tab_windows, sup_rows)

        n_tab_windows = n_windows  # widened after extras are known
        lane, sup, layer = derive(pos, w, c)

        # ---- layer cap + spill to extra rows ----
        n_extra = n_extra_split
        if nnz:
            for _round in range(max(spill_rounds, 1)):
                bw = sup * n_windows + w
                ubw, inv, cnt = _unique_ic(bw)
                if spill_beta:
                    # Economically optimal cap per bucket.  Keeping layer
                    # L costs CHUNKS*LANE slots and saves spilling the
                    # n_ge[L] cells at depth >= L one nonzero each, worth
                    # ~spill_beta slots apiece in the extras region
                    # (packing + combine overhead, measured ~2 slots/nnz
                    # at extras occupancy ~0.5).  Since n_ge[L] is
                    # non-increasing, the optimum has the closed form
                    # "depth of the k-th deepest cell", k = the smallest
                    # cell count that justifies a layer.  cap=0 (spill
                    # the whole bucket) is allowed: a near-empty bucket's
                    # content packs better as extras content than under
                    # its own 1024-slot layer.
                    cell = inv * (CHUNKS * LANE) + c * LANE + lane
                    ucell, dcount = np.unique(cell, return_counts=True)
                    cap = _beta_caps(ucell // (CHUNKS * LANE), dcount,
                                     len(ubw), spill_beta, cap_slack)
                else:
                    # layer cap per bucket: ideal layers plus a relative
                    # margin
                    cap = np.maximum(
                        -(-(cnt + (cnt * cap_margin).astype(np.int64))
                          // (CHUNKS * LANE)),
                        -(-cnt // (CHUNKS * LANE))) + cap_slack
                # absorb run padding as layer capacity (round 3): the
                # group order pads each superblock's group count to a
                # multiple of T_BASE with zero-slot groups; raising
                # bucket caps by that deficit converts pure padding
                # into spill capacity (fewer extras at the same
                # streamed bytes).  Approximate — the later extras/
                # combine buckets shift the counts a little — but most
                # of the padding converts.  Round 5: the deficit is
                # distributed over the superblock's buckets in
                # excess-descending order (the round-3 pass raised only
                # the single deepest bucket, leaving deficit unabsorbed
                # when its excess ran out).  The residual empty pads
                # (978 groups on the 10M-nnz leveled headline,
                # benchmarks/pad_decompose.py) come from POST-spill
                # drift — combine/extras-gather cells shifting rows-
                # region layer counts off tb-multiples — which this
                # pass cannot see; feedback passes that re-target the
                # shifted totals were measured drift-defeated (extras
                # −256 groups, rows +512), and shorter runs lose on
                # scatter RMWs (docs/AB_TBASE_r05.txt).
                lmax_b = np.zeros(len(ubw), np.int64)
                np.maximum.at(lmax_b, inv, layer + 1)
                used = np.minimum(lmax_b, cap)
                sup_b = ubw // n_windows
                usup, sup_binv = np.unique(sup_b, return_inverse=True)
                cnt_sup = np.zeros(len(usup), np.int64)
                np.add.at(cnt_sup, sup_binv, used)
                deficit = (-cnt_sup) % tb
                if deficit.any():
                    cap = _absorb_run_padding(cap, lmax_b - cap,
                                              sup_binv, len(usup),
                                              deficit)
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
        # pattern plans: every stored nonzero acts as 1.0 (values are a
        # stream the kernel never reads); the combine/extras machinery
        # already uses unit values
        vals_src = np.ones(nnz, np.float32) if pattern else csr.values
        extras_sup0 = extras_base // sup_rows
        lvl2_sup0 = extras_sup0
        if n_extra:
            # interleave extras by (occurrence-within-row, row): a row's
            # extras land at widely-spaced table slots, so their level-2
            # gathers spread over windows/chunks instead of stacking one
            # cell deep.  (A round-3 "dense-by-construction" band layout
            # optimizing the gather-slot cells was measured WORSE —
            # occ 0.455 -> 0.408 on the headline — because it clusters a
            # row's hot spill content into a few superblocks; spreading
            # the content dominates gather-slot density.)
            k_within = _cumcount(extra_to_row)
            is_extra = pos >= extras_base
            # (Content-(window,chunk) extras ordering was re-measured in
            # round 3 for the WIDE class with the slot balancer + singles
            # bypass active: extras region improves (occ 0.036 -> 0.042)
            # but the ROWS region blows up (18944 -> 24264 groups on the
            # 262K web graph) because singles' combine gather columns are
            # their extras indices — content-clustered indices stack
            # combine cells.  The interleave spreads them near-uniformly.
            # A band-primary/content-secondary hybrid loses the same way.)
            perm = np.lexsort((extra_to_row, k_within))
            inv_perm = np.empty(n_extra, np.int64)
            inv_perm[perm] = np.arange(n_extra, dtype=np.int64)
            extra_to_row = extra_to_row[perm]
            if is_extra.any():
                from ..native import (balance_extra_lanes,
                                      balance_extra_slots)

                # round-3: content-aware SLOT assignment — greedy on
                # projected cell depths (native pass; no-op without the
                # library).  The interleave spreads a row's extras
                # across superblocks; the balancer additionally chooses
                # each extra's (superblock, lane) inside a sliding
                # window of superblocks so hot content chunks stop
                # stacking layers (the older within-block lane-only
                # greedy is the fallback).
                safe_idx = np.clip(pos - extras_base, 0, n_extra - 1)
                ie = inv_perm[safe_idx][is_extra]
                cnt_i = np.bincount(ie, minlength=n_extra)
                ptr_i = np.zeros(n_extra + 1, np.int64)
                np.cumsum(cnt_i, out=ptr_i[1:])
                wc_arr = np.empty(len(ie), np.int64)
                wc_arr[ptr_i[ie] + _cumcount(ie)] = \
                    w[is_extra] * CHUNKS + c[is_extra]
                # default window 2 (round-3 atom-aware measurement:
                # win=2 nets 17536->17280 on the headline; win>=3 loses
                # it back to combine-window spread — single-extra rows'
                # gather columns move with the index, and wider shuffles
                # scatter them over more (row_sup, window) buckets)
                win = int(os.environ.get("TPU_SPMV_BALANCE_WINDOW", "2"))
                if win >= 1:
                    # direct-combine rows' (K <= bypass_k) nonzeros
                    # gather at cols_pad + (the index this pass
                    # assigns) — couple those cells into the score
                    # (native.cc rationale)
                    cnt_row = np.bincount(extra_to_row, minlength=rows)
                    crow = np.where(cnt_row[extra_to_row] <= _bypass_k(),
                                    extra_to_row, -1)
                    i2 = balance_extra_slots(
                        ptr_i, wc_arr, n_windows * CHUNKS, sup_rows,
                        window_sups=win, ext_crow=crow)
                else:
                    i2 = None
                if i2 is None:
                    lanes = balance_extra_lanes(
                        ptr_i, wc_arr, n_windows * CHUNKS, sup_rows)
                    if lanes is not None:
                        i2 = (np.arange(n_extra, dtype=np.int64) // LANE) \
                            * LANE + lanes
                if i2 is not None:
                    inv_perm = i2[inv_perm]
                    e2r_new = np.empty(n_extra, extra_to_row.dtype)
                    e2r_new[i2] = extra_to_row
                    extra_to_row = e2r_new
                pos = np.where(is_extra, extras_base + inv_perm[safe_idx],
                               pos)
            # fold the combine into the kernel, in up to TWO levels.  A
            # heavy row's K extras all target one output lane (row %
            # 128), so a flat combine would need K distinct table chunks
            # per lane — measured on the 10M-nnz headline it scattered
            # 88K combine nonzeros over 1.9K near-empty buckets
            # (occupancy 0.026).  Rows with MANY extras get ONE level-2
            # extra row of unit-valued gathers of their level-1 totals;
            # rows with K <= bypass_k extras skip level 2 entirely
            # (round-3; K=1 singles first, generalized to K<=2 late):
            # their combine nonzeros gather the level-1 totals directly
            # — the interleave keeps those gather columns spread, so
            # the direct cells ride existing rows-region buckets, while
            # every bypassed row shrinks the sparse L2 region (measured
            # on the 10M-nnz leveled headline: K<=2 removes 4101 of
            # 6580 L2 rows and 8202 of 22310 L2 gathers; L2 section 512
            # -> 384 groups with the rows region unchanged.  L2
            # occupancy was 0.012 — 3.4% of the plan for 0.2% of nnz).
            rows_w, lvl2_of_extra, k_count = np.unique(
                extra_to_row, return_inverse=True, return_counts=True)
            R2 = len(rows_w)
            bypass_k = _bypass_k()
            lvl2_row = k_count > bypass_k
            n_lvl2 = int(lvl2_row.sum())
            rho2_of_row = np.cumsum(lvl2_row) - 1     # rank among L2 rows
            is_lvl2 = lvl2_row[lvl2_of_extra]         # per L1 extra
            lvl2_base = -(-n_extra // sup_rows) * sup_rows
            lvl2_sup0 = extras_sup0 + lvl2_base // sup_rows
            me = np.nonzero(is_lvl2)[0]
            e2r_l2 = rows_w[lvl2_row]
            # balance the LEVEL-2 region (round-3 late; opt-in).  rho2
            # rank in row order scatters each L2 superblock's gathers
            # over all ~n_extra/1024 table windows.  The same slot
            # balancer as L1 — content = the row's L1 extras'
            # table-slot windows, crow-coupled to the FINAL combine
            # gather (which reads cols_pad + lvl2_base + the rank this
            # pass assigns) — clusters shared windows per superblock.
            # MEASURED NET-ZERO on the 10M-nnz leveled headline (L2
            # section 512 -> 384 groups, but clustering the final
            # gather columns raises the rows region by the same 128 —
            # rank order is already near-optimal spreading for the
            # rows region) and a no-op on the 262K web graph, so the
            # knob defaults OFF; kept for A/Bs on shapes whose L2
            # region dominates (TPU_SPMV_L2_BALANCE=1).
            if n_lvl2 and os.environ.get("TPU_SPMV_L2_BALANCE"):
                from ..native import balance_extra_slots

                old_rank = rho2_of_row[lvl2_of_extra[me]]
                cnt2 = np.bincount(old_rank, minlength=n_lvl2)
                ptr2 = np.zeros(n_lvl2 + 1, np.int64)
                np.cumsum(cnt2, out=ptr2[1:])
                o2 = np.argsort(old_rank, kind="stable")
                wc2 = (me[o2] // LANE).astype(np.int64)
                win2 = int(os.environ.get(
                    "TPU_SPMV_L2_WINDOW",
                    str(max(-(-n_lvl2 // sup_rows), 1))))
                n_wc2 = -(-(int(wc2.max()) + 1) // CHUNKS) * CHUNKS
                rho_bal = balance_extra_slots(
                    ptr2, wc2, n_wc2, sup_rows,
                    window_sups=win2, ext_crow=e2r_l2)
                if rho_bal is not None:
                    rho2_of_row[lvl2_row] = rho_bal
                    e2r_new2 = np.empty(n_lvl2, e2r_l2.dtype)
                    e2r_new2[rho_bal] = e2r_l2
                    e2r_l2 = e2r_new2
            pos_l2 = extras_base + lvl2_base \
                + rho2_of_row[lvl2_of_extra[me]]
            cols_l2 = cols_pad + me                   # L1 table slots
            # combine: direct-combine rows gather each L1 total at its
            # table slot; L2 rows gather their L2 total
            be = np.nonzero(~is_lvl2)[0]              # direct-read extras
            pos_fin = np.concatenate([extra_to_row[be],
                                      rows_w[lvl2_row]])
            cols_fin = np.concatenate(
                [cols_pad + be,
                 cols_pad + lvl2_base + rho2_of_row[lvl2_row]])
            pos = np.concatenate([pos, pos_l2, pos_fin])
            cols64 = np.concatenate([cols64, cols_l2, cols_fin])
            vals_src = np.concatenate(
                [vals_src,
                 np.ones(len(me) + len(pos_fin), np.float32)])
            extra_to_row = np.concatenate([extra_to_row, e2r_l2])
            n_extra_pos = lvl2_base + n_lvl2
        else:
            n_extra_pos = 0
        # gather-table sublanes for extras totals (pow2-bucketed to bound
        # the compiled-variant count)
        e8 = _pad_geo(max(-(-n_extra_pos // sup_rows), 1), minimum=1) \
            * n_tb
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
        # the gather table before row groups' combine slots read them),
        # then row superblocks
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

        # groups are ordered by (region, sup, w, layer); nnz → group index
        group_start = np.zeros(len(ubw), np.int64)
        if len(ubw):
            np.cumsum(lmax[:-1], out=group_start[1:])

        # ---- pad group runs so every T_BASE-aligned run shares one
        # superblock (the scatter base), and each extras section (level-1,
        # level-2) ends at a block boundary — the extras→table copies
        # happen between grid steps ----
        fin_blocks: list[int] = []
        if n_groups_real:
            change = np.nonzero(np.diff(g_sup))[0] + 1
            run_starts = np.concatenate(
                [np.zeros(1, np.int64), change]).astype(np.int64)
            run_ends = np.concatenate(
                [change, np.asarray([n_groups_real], np.int64)])
            run_counts = run_ends - run_starts
            run_sup = g_sup[run_starts]
            pad_counts = -(-run_counts // tb) * tb
            # processing order: level-1 extras, level-2 extras, rows
            run_lvl1 = (run_sup >= extras_sup0) & (run_sup < lvl2_sup0)
            run_lvl2 = run_sup >= lvl2_sup0
            running = 0
            for sec in (run_lvl1, run_lvl2):
                if not sec.any():
                    continue
                last = int(np.nonzero(sec)[0][-1])
                sec_total = running + int(pad_counts[sec].sum())
                deficit = (-sec_total) % S
                pad_counts[last] += deficit
                running = sec_total + deficit
                fin_blocks.append(running // S)
            total = int(pad_counts.sum())
            n_blocks = max(-(-total // S), 1)
            pad_counts[-1] += n_blocks * S - total
            new_starts = np.zeros(len(run_counts), np.int64)
            np.cumsum(pad_counts[:-1], out=new_starts[1:])
            old_to_new = np.repeat(new_starts - run_starts, run_counts) \
                + np.arange(n_groups_real, dtype=np.int64)
            g_sup_pad = np.repeat(run_sup, pad_counts)
            # interleave scatter bases: cycle consecutive T_BASE runs
            # through different superblocks within each section, so the
            # (8,128) output read-modify-writes hit different addresses —
            # same-address RMW chains serialize the VPU (measured ~1.5x
            # on the headline).  Section order (lvl1, lvl2, rows) and the
            # section block boundaries are preserved.
            rs_pad = g_sup_pad[::tb]
            r_reg = np.where(rs_pad < extras_sup0, 2,
                             np.where(rs_pad < lvl2_sup0, 0, 1))
            rk = _cumcount(rs_pad)
            run_perm = np.lexsort((rs_pad, rk, r_reg))
            new_of_old_run = np.empty(len(run_perm), np.int64)
            new_of_old_run[run_perm] = np.arange(len(run_perm),
                                                 dtype=np.int64)
            old_to_new = new_of_old_run[old_to_new // tb] * tb \
                + old_to_new % tb
            g_sup_pad = rs_pad[run_perm].repeat(tb)
        else:
            n_blocks = 1
            old_to_new = np.zeros(0, np.int64)
            g_sup_pad = np.zeros(S, np.int64)
        n_groups_pad = n_blocks * S

        # memory-blowup guard: fires when the packed layout would be both
        # large in absolute terms (> 4M slots = 24 MB) and heavily inflated
        # relative to nnz
        slots = n_groups_pad * CHUNKS * LANE
        if nnz and slots > max_inflation * nnz and slots > (1 << 22):
            raise WindowEllOverflow(
                f"window-ELL padding {slots} slots for {nnz} nnz "
                f"(inflation {slots / nnz:.1f}x > {max_inflation}x)")
        # per-group window/base indices are scalar-prefetched into SMEM
        # (~1 MB); refuse plans whose prefetch would not fit
        if n_groups_pad > MAX_GROUPS:
            err = WindowEllOverflow(
                f"window-ELL plan needs {n_groups_pad} groups; the "
                f"per-group window table would exceed SMEM")
            # sizing hint for build_banded: bands needed to fit SMEM
            err.needed_groups = n_groups_pad
            raise err
        out8 = extras_base // LANE + e8
        cols8 = cols_pad // LANE
        # double-buffered packed blocks: 6 B/slot (f32 vals + lo + sb),
        # 2 B/slot for pattern plans (no vals stream)
        vmem_bytes = (cols8 + e8 + out8) * LANE * 4 \
            + 2 * S * CHUNKS * LANE * (2 if pattern else 6)
        if vmem_bytes > VMEM_BUDGET:
            err = WindowEllOverflow(
                f"window-ELL working set {vmem_bytes} B exceeds the VMEM "
                f"budget {VMEM_BUDGET} B")
            # sizing hints for build_banded: the x-block + double-buffer
            # bytes do not shrink with row banding; the output/extras
            # tables do
            err.vmem_fixed = cols8 * LANE * 4 + 2 * S * CHUNKS * LANE * 6
            err.vmem_var = (e8 + out8) * LANE * 4
            raise err

        n_steps = _pad_geo(n_blocks)
        blk = np.full(n_steps, -1, np.int32)
        blk[:n_blocks] = np.arange(n_blocks, dtype=np.int32)
        fin = np.zeros(n_steps, np.int32)
        for b in fin_blocks:
            fin[b] = 1

        vals = np.zeros((n_groups_pad * CHUNKS, LANE), np.float32)
        lo = np.zeros((n_groups_pad * CHUNKS, LANE), np.int8)
        sb = np.zeros((n_groups_pad * CHUNKS, LANE), np.int8)
        wg_arr = np.zeros(n_groups_pad, np.int64)
        if n_groups_real:
            wg_arr[old_to_new] = g_w
        base = (g_sup_pad[::tb] * n_tb).astype(np.int32)
        if n_all:
            from ..native import fill_slots

            group_of_nnz = old_to_new[group_start[inv] + layer]
            flat = group_of_nnz * (CHUNKS * LANE) + c * LANE + lane
            fill_slots(flat, vals_src, cols64 % LANE, (pos // LANE) % n_tb,
                       vals, lo, sb)
        # nibble-pack the sb stream across group pairs when targets fit
        # 4 bits (narrow superblocks): groups 2t/2t+1 share one int8 vreg
        # (-0.5 B/slot; n_groups_pad is always even — S is a multiple
        # of 8).  The kernel unpacks with `& 15` on both nibbles, which
        # is sign-extension-safe for sb values 8..15.  Pattern plans
        # reserve nibble 15 for the pad sentinel, so they need
        # n_tb <= 15 (true at every standard SUP level that packs).
        sbn = n_tb <= 16 and (not pattern or n_tb <= 15)
        if pattern:
            # pad slots have no zero value to mask their gathered
            # garbage — give them a sub-block no masked-sum target
            # matches (15 packs into either nibble; -1 on the int8
            # stream).  All-real-1.0 values make vals==0 ⇔ pad.
            sb[vals == 0] = 15 if sbn else -1
        if sbn:
            pairs = sb.reshape(n_groups_pad // 2, 2, CHUNKS, LANE)
            sb = (pairs[:, 0] | (pairs[:, 1] << 4)).reshape(-1, LANE)

        # device_put straight from NumPy: jnp.asarray would materialize
        # on the DEFAULT device first, which round-trips every leaf
        # through the accelerator when targeting another device
        from ..errors import guarded_device_put

        put = lambda a: guarded_device_put(a, device)  # noqa: E731
        if not pattern and np.dtype(values_dtype) != np.float32:
            # opt-in half-width value stream (bf16 is the TPU-native
            # reduced dtype): 5.5 → 3.5 B/slot and half the plan HBM/
            # upload footprint; the kernel converts to f32 at load and
            # accumulates in f32 (~4e-3 relative value error).  Cast
            # LAST so the pad-sentinel logic above sees exact zeros.
            vals = vals.astype(jnp.bfloat16)
        return WindowEllPlan(
            vals=None if pattern else put(vals),
            lo=put(lo),
            sb=put(sb),
            wg=put(wg_arr.astype(np.int32)),
            base=put(base),
            blk_step=put(blk),
            fin_step=put(fin),
            extra_to_row=put(extra_to_row.astype(np.int32)),
            num_rows=rows,
            num_cols=csr.num_cols,
            extras_base=int(extras_base),
            n_extra=int(len(extra_to_row)),
            e8=int(e8),
            out8=int(out8),
            cols_pad=cols_pad,
            step_groups=S,
            split_rows=split_rows,
            sup=sup_rows,
            occupancy=float(nnz / slots) if slots else 0.0,
            sbn=sbn,
            pat=pattern,
            tb=tb,
            lam=put(lam_arr) if lam_arr is not None else None,
        )


def _use_interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


# measure-and-pick: when a superblock candidate's analytic cost lands
# within its contention ratio of the model's best, stop trusting the
# model — it cannot see row splitting, row→lane leveling or the
# atom-aware balancers (all of which specifically shrink narrow
# plans), which is how the round-4 skew-585 mischoice FAILED a driver
# artifact.  Candidates in contention are re-scored with SAMPLED REAL
# BUILDS (every m-th superblock band through the full packer).  The
# ratios are ASYMMETRIC because the model's bias is one-directional:
# it over-prices NARROW plans by up to ~4x (the invisible transforms
# only ever shrink them — skew-585: est 4x over; round-5 grid: actual
# narrow cost 1.2x wide while the model said > 2x), while wide
# estimates track actuals within ~1.4x (docs/PERF.md est/actual
# history).  docs/MODEL_GRID_r05.json validates the resulting picks.
PROBE_AMBIG_NARROW = 5.0       # narrow candidate contends within 5x
PROBE_AMBIG_WIDE = 2.0         # wide candidates contend within 2x
PROBE_MIN_NNZ = 200_000        # below this, builds are cheap either way
PROBE_TARGET_NNZ = 1_500_000   # sampled-build size (~1 s of packer)


def _sample_bands(csr: CSRMatrix, sup: int, m: int) -> CSRMatrix:
    """Every ``m``-th ``sup``-row band of ``csr`` stacked into one
    matrix (same columns) — the builder-faithful sampling unit the
    analytic model uses, applied to a REAL build."""
    n_sups = -(-csr.num_rows // sup)
    bands = [(i * sup, min((i + 1) * sup, csr.num_rows))
             for i in range(0, n_sups, m)]
    ptr64 = csr.row_ptrs.astype(np.int64)
    vals, cols, ptr_parts, base = [], [], [np.zeros(1, np.int64)], 0
    for a, b in bands:
        lo, hi = int(ptr64[a]), int(ptr64[b])
        vals.append(csr.values[lo:hi])
        cols.append(csr.col_indices[lo:hi])
        ptr_parts.append(ptr64[a + 1:b + 1] - lo + base)
        base += hi - lo
    return CSRMatrix(sum(b - a for a, b in bands), csr.num_cols,
                     np.concatenate(vals), np.concatenate(cols),
                     np.concatenate(ptr_parts))


def _probe_groups(csr: CSRMatrix, sup: int, split_rows) -> float | None:
    """Actual (scaled) group count of a sampled real build at ``sup`` —
    sees everything the analytic model cannot.  ``None`` = the sampled
    build overflowed (treated as model-cost-only by the caller)."""
    n_sups = -(-csr.num_rows // sup)
    m = max(1, min(csr.nnz // PROBE_TARGET_NNZ, n_sups))
    sub = csr if m <= 1 else _sample_bands(csr, sup, m)
    narrow = sup == SUP_LEVELS[0]
    beta, slack = _auto_caps(sup)
    try:
        p = WindowEllPlan.build(
            sub, sup=sup, split_rows=split_rows if narrow else None,
            spill_beta=beta, cap_slack=slack,
            permute_rows=_permute_default())
    except WindowEllOverflow:
        return None
    sampled_sups = -(-n_sups // m)
    return p.n_groups * (n_sups / sampled_sups)


def _choose_sup(csr: CSRMatrix, with_groups: bool = False,
                split_rows: int | None = None):
    """Pick the superblock height by the measured cost model.

    For each candidate, estimate streamed slots (bucket-capped groups plus
    an extras-region term for the spilled mass) and score them at the
    measured per-slot rates (HBM stream + per-target masked-sum scatter).
    Candidates whose group count would blow the SMEM prefetch budget are
    skipped unless row banding can subdivide them (see
    :func:`build_auto`).  ``with_groups=True`` also returns the winner's
    estimated group count (0 = unknown), letting ``build_auto`` pre-size
    bands instead of paying a doomed full-matrix build.

    When the model's top two candidates score within
    ``PROBE_AMBIG_RATIO``, the choice is settled by sampled REAL builds
    instead (``_probe_groups``) — the analytic model is blind to row
    splitting (``split_rows``, threaded from the dispatch) and to
    row→lane leveling, both of which shrink narrow plans on skewed
    structure (the round-4 skew-585 incident; validated on the
    round-5 structure grid, docs/MODEL_GRID_r05.json).  Env
    ``TPU_SPMV_NO_SUP_PROBE=1`` disables the probe for A/Bs.
    """
    nnz = csr.nnz
    if nnz == 0:
        return (SUP_LEVELS[0], 0) if with_groups else SUP_LEVELS[0]
    # the probe only pays in the depth regime where the model's
    # narrow-side blindness (splitting/leveling) has mass to act on:
    # mean narrow bucket depth in [0.5, 2.0) (>= 2 short-circuits to
    # narrow above; far below, narrow groups are empty-bucket-floor
    # bound, which the model prices accurately — grid evidence: all
    # depth < 0.1 picks were already correct pre-probe while the
    # depth-1.8-1.9 picks were all wrong, docs/MODEL_GRID_r05.json).
    depth = nnz / ((-(-max(csr.num_rows, 1) // SUP_LEVELS[0]))
                   * (_bucket(max(csr.num_cols, 1)) // WINDOW)
                   * (CHUNKS * LANE))
    if depth >= 2.0:
        # dense-narrow short-circuit (same gate _rank_sups applies) —
        # taken HERE, before the O(nnz) coordinate arrays are
        # materialized: the headline class answers from nnz + dims alone
        return (SUP_LEVELS[0], 0) if with_groups else SUP_LEVELS[0]
    rows_of = np.repeat(np.arange(csr.num_rows, dtype=np.int64),
                        np.diff(csr.row_ptrs).astype(np.int64))
    ranked = _rank_sups(rows_of, csr.col_indices.astype(np.int64),
                        csr.num_rows, csr.num_cols)
    best, best_cost, best_groups = ranked[0]
    contenders = [
        (s, mc, mg) for s, mc, mg in ranked
        if mc <= best_cost * (PROBE_AMBIG_NARROW if s == SUP_LEVELS[0]
                              else PROBE_AMBIG_WIDE)]
    if (len(contenders) >= 2 and nnz >= PROBE_MIN_NNZ and depth >= 0.5
            and not os.environ.get("TPU_SPMV_NO_SUP_PROBE")):
        scored = []
        for s, model_cost, model_groups in contenders:
            g = _probe_groups(csr, s, split_rows)
            if g is None:
                scored.append((model_cost, s, model_groups))
            else:
                scored.append((g * (_STREAM_PS + _SCATTER_PS[s]), s,
                               int(g)))
        scored.sort()
        best, best_groups = scored[0][1], scored[0][2]
    return (best, best_groups) if with_groups else best


def _rank_sups(rows_of: np.ndarray, cols64: np.ndarray,
               num_rows: int, num_cols: int) -> list:
    """Analytic superblock ranking on raw coordinates (NO probe):
    ``[(sup, model_cost, est_groups), ...]`` best-first.  The probe-free
    core shared by :func:`_choose_sup` and :func:`build_composite`
    (which re-ranks per level on the shrinking remainder and must not
    pay sampled builds per level)."""
    nnz = len(rows_of)
    if nnz == 0:
        return [(SUP_LEVELS[0], 0.0, 0)]
    cols_pad = _bucket(max(num_cols, 1))
    n_windows = cols_pad // WINDOW
    n_sups0 = -(-max(num_rows, 1) // SUP_LEVELS[0])
    # short-circuit: when narrow (1024-row) buckets are already deep, the
    # narrow mode always wins (wider superblocks only add scatter
    # targets).  Threshold 2.0 (round 4, was 8.0): at mean bucket depth
    # >= 2 the narrow realized occupancy is >= ~0.25, so narrow costs
    # <= ~36 ps/nnz while sup=4096's fori scatter floor is ~50 even at
    # occupancy 0.5 — and the sampled model below does NOT see row
    # splitting or row→lane leveling, both of which specifically shrink
    # narrow plans on skewed structure (measured: the 131K/skew-585
    # perf-property matrix at depth 7.15 built 6.5K narrow groups
    # ≈ 59 µs vs the model's wide pick at 138 µs — the model
    # over-priced narrow ~4x and flipped the choice).  Re-validated on
    # the round-5 structure grid (depth 2-16 rows all narrow-best,
    # docs/MODEL_GRID_r05.json); ambiguity below the threshold is now
    # settled by the sampled-build probe rather than the raw model.
    if nnz / (n_sups0 * n_windows * (CHUNKS * LANE)) >= 2.0:
        return [(SUP_LEVELS[0], 0.0, 0)]
    costs = _sampled_sup_costs(rows_of, cols64, num_rows, num_cols)
    if not costs:
        return [(SUP_LEVELS[-1], float("inf"), 0)]
    return sorted(((s, c, g) for s, (c, g) in costs.items()),
                  key=lambda t: t[1])


def _sampled_sup_costs(rows_of: np.ndarray, cols64: np.ndarray,
                       num_rows: int, num_cols: int) -> dict:
    """The sampled packing-cost model behind :func:`_choose_sup`, on raw
    (row, col) coordinate arrays: ``{sup: (cost, est_groups)}`` for every
    non-disqualified level.  Exposed on coordinates (rather than a CSR)
    so the structure-adaptive reordering probe (``kernels/reorder.py``)
    can score a candidate relabeling without materializing the permuted
    matrix.

    Samples WHOLE SUPERBLOCKS (all nonzeros of every m-th sup row band)
    rather than striding nonzeros: the model mirrors the builder's
    order-statistic layer caps (spill_beta ~2.6, cap_slack 1), and
    order statistics of per-cell depths are destroyed by nnz striding
    (shallow cells have depth 1-5; scaling a strided count back up
    mis-ranks them, which flipped the selection with the stride).
    Within a sampled bucket depths are EXACT; group counts scale by
    the sampling factor afterwards.  The round-2 model's nnz striding
    additionally over-counted shallow-bucket floors stride-fold (1M
    web graph: est 424K groups at sup=16384 vs 165K actual).
    Validated against built plans: est/actual 0.96-0.97 on the 262K
    web graph (sup=4096) and the 10M headline; ~1.4 at sup=16384
    (its high measured per-slot scatter cost dominates selection
    anyway).
    """
    nnz = len(rows_of)
    cols_pad = _bucket(max(num_cols, 1))
    n_windows = cols_pad // WINDOW
    out = {}
    for s in SUP_LEVELS:
        sup_id = rows_of // s
        n_sups = -(-num_rows // s)
        # target ~1M sampled nnz in whole-superblock units
        m = max(1, min(nnz // 1_000_000, n_sups))
        if m > 1:
            sel = sup_id % m == 0
            rws, cls, sid = rows_of[sel], cols64[sel], sup_id[sel]
        else:
            rws, cls, sid = rows_of, cols64, sup_id
        w = cls // WINDOW
        lane = rws % LANE
        c = (cls // LANE) % CHUNKS
        bucket = sid * n_windows + w
        ub, binv, bcnt = _unique_ic(bucket)
        cell = binv * (CHUNKS * LANE) + c * LANE + lane
        ucell, _, dcount = _unique_ic(cell)
        cb = ucell // (CHUNKS * LANE)
        cap = _beta_caps(cb, dcount, len(ub), *_auto_caps(s))
        lmax = np.zeros(len(ub), np.int64)
        np.maximum.at(lmax, cb, dcount)
        kept = int(np.minimum(lmax, cap).sum())
        spilled = int((dcount - cap[cb]).clip(0).sum())
        # Extras-region occupancy scales with the superblock height
        # (more rows per bucket -> denser extras cells): measured
        # 0.012-0.021 / 0.03-0.056 / 0.08-0.13 on the 65K/262K/1M
        # web graphs for sup 1024/4096/16384.  The dense-narrow class
        # (high extras occupancy) short-circuits above and never
        # reaches this estimate.
        occ_e = {1024: 0.018, 4096: 0.04, 16384: 0.09}[s]
        sampled_sups = -(-n_sups // m)
        groups = int((kept + spilled / (CHUNKS * LANE * occ_e))
                     * (n_sups / sampled_sups))
        slots = groups * CHUNKS * LANE
        # mirror the build-time guards: inflation always disqualifies;
        # the SMEM prefetch cap only when row banding cannot subdivide
        # (build_auto rescues over-MAX_GROUPS candidates as a BandedPlan)
        if slots > 64.0 * nnz and slots > (1 << 22):
            continue
        if groups > MAX_GROUPS and num_rows <= s:
            continue
        out[s] = (groups * (_STREAM_PS + _SCATTER_PS[s]), groups)
    return out


@functools.lru_cache(maxsize=64)
def _build_pallas(n_steps: int, S: int, out8: int, cols8: int, e8: int,
                  rows_sub: int, n_tb: int, interpret: bool,
                  vma: frozenset | None = None, sbn: bool = False,
                  pat: bool = False, tb: int = T_BASE):
    T = min(T_SUB, S)
    TB = min(tb, T)

    def kernel(*refs):
        if pat:
            # pattern plans stream no values — nonzeros are implicit 1.0
            # and pad slots carry the sentinel sub-block (no masked-sum
            # target matches), see WindowEllPlan.vals
            (wg_ref, base_ref, blk_ref, fin_ref, x_ref, lo_ref,
             sb_ref, o_ref) = refs
            v_ref = None
        else:
            (wg_ref, base_ref, blk_ref, fin_ref, x_ref, v_ref, lo_ref,
             sb_ref, o_ref) = refs
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        # extras groups finished in an earlier step: publish their totals
        # into the gather block (x_ref carries an extras-table region after
        # x; Pallas input blocks are mutable VMEM, and the constant index
        # map means the block is fetched once, so the write persists for
        # all later steps) — row groups' combine slots then read them
        # exactly like x entries
        @pl.when(fin_ref[i] == 1)
        def _():
            x_ref[cols8:cols8 + e8, :] = o_ref[rows_sub:rows_sub + e8, :]

        gbase = blk_ref[i] * S

        def body(q):
            # q is a Python int: the sub-tile loop is STATICALLY UNROLLED.
            # A lax.fori_loop here costs ~2.5 ps/slot (measured): Mosaic
            # cannot software-pipeline the next grid step's input DMA
            # across a dynamic loop, so compute stops overlapping the
            # stream and the kernel falls off the HBM roof (10.9 vs 8.4
            # ps/slot).  v2 has no live ranges — every sub-tile processes
            # zero-padded slots — so the bounds are static and unrolling
            # is exact.
            qs = q * T * CHUNKS
            if not isinstance(q, int):   # fori path: alignment hint
                qs = pl.multiple_of(qs, T * CHUNKS)
            lo_q = lo_ref[pl.ds(qs, T * CHUNKS), :].astype(jnp.int32)
            # f32 at load (no-op for f32 streams; bf16 value streams
            # convert once per block — the (T*CHUNKS)=128-row slice is
            # bf16-tile-aligned, and downstream 8-row slices then work
            # on f32 tiles)
            v_q = None if pat \
                else v_ref[pl.ds(qs, T * CHUNKS), :].astype(jnp.float32)
            # int32 for the target compares: v5e rejects i8 vector compares
            if sbn:
                # nibble-packed sb: group pair 2t/2t+1 shares a vreg; the
                # `& 15` on both nibbles is sign-extension-safe for
                # stored values 8..15 (int8 <<4 wraps negative)
                qs2 = q * (T // 2) * CHUNKS
                if not isinstance(q, int):
                    qs2 = pl.multiple_of(qs2, (T // 2) * CHUNKS)
                sb_pk = sb_ref[pl.ds(qs2, (T // 2) * CHUNKS), :] \
                    .astype(jnp.int32)
                sb_even = sb_pk & 15
                sb_odd = (sb_pk >> 4) & 15
            else:
                sb_q = sb_ref[pl.ds(qs, T * CHUNKS), :].astype(jnp.int32)
            prods = []
            for t in range(T):
                wdw = wg_ref[gbase + q * T + t]
                table = x_ref[
                    pl.ds(pl.multiple_of(wdw * CHUNKS, CHUNKS), CHUNKS), :]
                g = jnp.take_along_axis(table, lo_q[8 * t:8 * t + 8, :],
                                        axis=1)
                prods.append(g if pat else v_q[8 * t:8 * t + 8, :] * g)
            prod = jnp.concatenate(prods, axis=0)
            # fold by target sub-block and add at the run's dynamic base:
            # one (n_tb,128) read-modify-write per T_BASE groups
            for h in range(T // TB):
                ph = prod[TB * 8 * h:TB * 8 * (h + 1), :]
                if sbn:
                    # reassemble run order from the even/odd nibble planes
                    sh = jnp.concatenate(
                        [(sb_even if t % 2 == 0 else sb_odd)[
                            ((TB * h + t) // 2) * 8:
                            ((TB * h + t) // 2) * 8 + 8, :]
                         for t in range(TB)], axis=0)
                else:
                    sh = sb_q[TB * 8 * h:TB * 8 * (h + 1), :]
                rows_acc = [jnp.sum(jnp.where(sh == t, ph, 0.0), axis=0,
                                    keepdims=True) for t in range(n_tb)]
                acc = jnp.concatenate(rows_acc, axis=0)
                dst = pl.multiple_of(
                    base_ref[(gbase + q * T) // TB + h], n_tb)
                o_ref[pl.ds(dst, n_tb), :] += acc

        @pl.when(blk_ref[i] >= 0)
        def _():
            if (S // T) * n_tb <= 192:
                # narrow superblocks: full static unroll (HBM-roof path)
                for q in range(S // T):
                    body(q)
            else:
                # wide superblocks: the unrolled masked-sum ladders would
                # blow up the Mosaic program (minutes of compile); these
                # plans are scatter-bound, so the lost DMA overlap costs
                # relatively little
                jax.lax.fori_loop(0, S // T,
                                  lambda q, c: (body(q), c)[1], 0)

    stream_spec = pl.BlockSpec((S * CHUNKS, LANE),
                               lambda i, wg, base, blk, fin:
                               (jnp.maximum(blk[i], 0), 0),
                               memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((cols8 + e8, LANE), lambda i, *m: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if not pat:        # the f32 vals stream (absent on pattern plans)
        in_specs.append(stream_spec)
    in_specs.append(stream_spec)                       # lo
    in_specs.append(
        pl.BlockSpec((S * CHUNKS // 2 if sbn else S * CHUNKS, LANE),
                     lambda i, wg, base, blk, fin:
                     (jnp.maximum(blk[i], 0), 0),
                     memory_space=pltpu.VMEM))         # sb
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((out8, LANE), lambda i, *m: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    # vma: the varying-manual-axes annotation for shard_map check_vma=True
    # (the sharded packed path, tpu_spmv/parallel/distributed.py); Mosaic
    # treats the kernel as a unit so annotating the out-struct suffices
    out_sds = jax.ShapeDtypeStruct((out8, LANE), jnp.float32) \
        if vma is None else \
        jax.ShapeDtypeStruct((out8, LANE), jnp.float32, vma=vma)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_sds,
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def _build_unpermute(n_tiles_pad: int, interpret: bool):
    """Lane-gather kernel restoring row order for ``permute_rows`` plans:
    ``out[t, j] = y[t, lam[t, j]]`` — the within-sublane lane shuffle is
    the one fast dynamic gather the VPU exposes (same primitive as the
    main kernel's x-table gather).  Pure HBM copy otherwise (~8 B/row);
    done in Pallas because XLA lowers host-level ``take_along_axis`` to
    a generic gather (measured ~0.12 Gelem/s on v5e — docs/PERF.md)."""
    t_u = min(512, n_tiles_pad)

    def kernel(y_ref, lam_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(y_ref[:], lam_ref[:], axis=1)

    return pl.pallas_call(
        kernel,
        grid=(n_tiles_pad // t_u,),
        in_specs=[
            pl.BlockSpec((t_u, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_u, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_u, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles_pad, LANE), jnp.float32),
        interpret=interpret,
    )


def _unpermute_tiles(out: jax.Array, lam: jax.Array,
                     num_rows: int) -> jax.Array:
    """Restore original row order from a leveled (out8, 128) output
    block: gather each tile's lanes through ``lam`` and trim."""
    n_tiles_pad = lam.shape[0]
    n_tiles = min(n_tiles_pad, out.shape[0])
    y = out[:n_tiles]
    if n_tiles_pad > n_tiles:
        y = jnp.pad(y, ((0, n_tiles_pad - n_tiles), (0, 0)))
    y = _build_unpermute(n_tiles_pad, _use_interpret())(y, lam)
    return y.reshape(-1)[:num_rows]


def _spmv_window_ell(plan: WindowEllPlan, x: jax.Array,
                     vma: frozenset | None = None) -> jax.Array:
    """Unjitted impl of :func:`spmv_window_ell` (``vma`` threads the
    shard_map varying-axes annotation into the pallas_call)."""
    x = jnp.asarray(x, jnp.float32)
    # the gather block = padded x followed by the extras-totals region
    x_pad = jnp.pad(x, (0, plan.cols_pad + plan.e8 * LANE - x.shape[0]))
    x2d = x_pad.reshape(plan.cols_pad // LANE + plan.e8, LANE)
    rows_sub = plan.extras_base // LANE
    fn = _build_pallas(plan.n_steps, plan.step_groups, plan.out8,
                       plan.cols_pad // LANE, plan.e8, rows_sub,
                       plan.sup // LANE, _use_interpret(), vma, plan.sbn,
                       plan.pat, plan.tb)
    streams = (plan.lo, plan.sb) if plan.pat \
        else (plan.vals, plan.lo, plan.sb)
    out = fn(plan.wg, plan.base, plan.blk_step, plan.fin_step, x2d,
             *streams)
    if plan.lam is not None:
        return _unpermute_tiles(out, plan.lam, plan.num_rows)
    return out.reshape(-1)[: plan.num_rows]


@jax.jit
def spmv_window_ell(plan: WindowEllPlan, x: jax.Array) -> jax.Array:
    """``y = A @ x`` via the window-ELL plan.  ``x`` is the unpadded operand
    (``num_cols``,); returns ``(num_rows,)``.  The extras combine runs
    inside the kernel (table fold) — no host-side scatter remains."""
    return _spmv_window_ell(plan, x)


def spmv_pattern(plan: WindowEllPlan, scale: jax.Array,
                 x: jax.Array) -> jax.Array:
    """``y = (B·diag(scale)) @ x`` over a PATTERN plan of B: the column
    scale folds into x (one fused elementwise multiply), the kernel
    streams no values.  Same per-slot products and fold order as the
    equivalent natural plan."""
    return spmv_window_ell(plan, scale * x)


def spmv_pattern_banded(plan: "BandedPlan", scale: jax.Array,
                        x: jax.Array) -> jax.Array:
    """Banded form of :func:`spmv_pattern`."""
    return spmv_banded(plan, scale * x)


# ---- composite plans: cap-and-respill across levels (wide matrices) ----

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CompositePlan:
    """A stack of window-ELL plans plus a flat remainder.

    Wide sparse matrices (e.g. 1M-node web graphs) pack poorly as ONE
    plan: shallow (superblock, window) buckets leave most slots empty
    because a bucket needs max-cell-depth layers.  Instead each level
    keeps only the FIRST layer of every cell (near-uniform depth, dense
    groups) and the over-depth mass is re-packed as the next level's
    matrix; the last few stray nonzeros run on the flat XLA path.
    ``y = Σ level_i(x) + flat(tail, x)`` — deterministic, order fixed.
    """

    plans: tuple             # WindowEllPlan per level
    tail: object | None     # DeviceCSR remainder (flat path) or None
    num_rows: int
    num_cols: int

    def tree_flatten(self):
        return ((self.plans, self.tail), (self.num_rows, self.num_cols))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(tuple(children[0]), children[1], *aux)

    @property
    def occupancy(self) -> float:
        tot = sum(p.n_groups * CHUNKS * LANE for p in self.plans)
        nnz = sum(float(p.occupancy) * p.n_groups * CHUNKS * LANE
                  for p in self.plans)
        return nnz / tot if tot else 0.0

    def save(self, path: str) -> None:
        """Persist the built plan stack (see :mod:`tpu_spmv.plan_io`)."""
        from ..plan_io import save_plan

        save_plan(self, path)

    @staticmethod
    def load(path: str, device=None) -> "CompositePlan":
        from ..plan_io import load_plan

        plan = load_plan(path, device)
        if not isinstance(plan, CompositePlan):
            raise InvalidFormatError(
                f"{path}: holds a {type(plan).__name__}, not a CompositePlan")
        return plan


def _subset_csr(csr: CSRMatrix, rows_of: np.ndarray,
                mask: np.ndarray) -> CSRMatrix:
    """A same-shape CSR holding only the masked nonzeros."""
    rr = rows_of[mask]
    ptr = np.zeros(csr.num_rows + 1, np.int32)
    np.cumsum(np.bincount(rr, minlength=csr.num_rows), out=ptr[1:])
    return CSRMatrix(csr.num_rows, csr.num_cols, csr.values[mask],
                     csr.col_indices[mask], ptr)


def build_composite(csr: CSRMatrix, step_groups: int | None = None,
                    max_levels: int = 3, split_rows: int | None = None,
                    device=None,
                    permute_rows: bool | None = None) -> CompositePlan:
    """Build the multi-level composite layout (see :class:`CompositePlan`).

    Each level's superblock height comes from the cost model on what is
    left.  A narrow level keeps each cell's layers up to the bucket cap
    (the mass that packs at high occupancy with NO extras machinery); a
    wide level keeps one layer per cell.  The FINAL level absorbs the
    remainder with the full split/spill/extras machinery — measured on
    the 10M-nnz headline, giving the over-cap mass (heavy-row residue +
    Poisson tails) its own plan packs it at 0.43 occupancy versus 0.27
    as an in-plan extras region (the per-row extra slots there inherit
    the structure; a standalone build re-balances them).  Splitting in
    non-final levels is unnecessary: the cap-keep strips heavy rows'
    excess into the next level.
    """
    if permute_rows is None:
        permute_rows = _permute_default()
    plans = []
    # the level loop works on shrinking COORDINATE arrays — rows_of /
    # cols64 are derived ONCE and masked per level, and the level's
    # superblock comes from the probe-free analytic ranking.  (Round-5
    # build-cost fix: the previous per-level `_choose_sup(rem)` +
    # `_subset_csr` re-derived the O(nnz) coordinate arrays from a
    # rebuilt CSR on every level AND — after measure-and-pick landed —
    # paid sampled probe builds per level; profiled at ~40% of the
    # composite's 63 s at half-headline scale.)
    nr, nc = csr.num_rows, csr.num_cols
    cols_pad = _bucket(max(nc, 1))
    n_windows = cols_pad // WINDOW

    def coords_csr(r, c32, v):
        ptr = np.zeros(nr + 1, np.int64)
        np.cumsum(np.bincount(r, minlength=nr), out=ptr[1:])
        return CSRMatrix(nr, nc, v, c32, ptr)

    r = np.repeat(np.arange(nr, dtype=np.int64),
                  np.diff(csr.row_ptrs).astype(np.int64))
    c64 = csr.col_indices.astype(np.int64)
    c32, v = csr.col_indices, csr.values
    done = False
    for lvl in range(max_levels):
        s = _rank_sups(r, c64, nr, nc)[0][0]
        narrow = s == SUP_LEVELS[0]
        if lvl == max_levels - 1 or (narrow and lvl > 0) \
                or len(r) < (1 << 16):
            # final level: full machinery (splits + extras) takes the rest
            try:
                plans.append(WindowEllPlan.build(
                    coords_csr(r, c32, v), split_rows=split_rows,
                    step_groups=step_groups, device=device,
                    permute_rows=permute_rows))
                done = True
            except WindowEllOverflow:
                pass                  # remainder to the flat tail
            break
        cell = (((r // s) * n_windows + c64 // WINDOW)
                * (CHUNKS * LANE)
                + ((c64 // LANE) % CHUNKS) * LANE + r % LANE)
        layer = _cumcount(cell)
        if narrow:
            bucket = cell // (CHUNKS * LANE)
            _, binv, bcnt = _unique_ic(bucket)
            cap = np.maximum(
                -(-(bcnt + (bcnt * 0.3).astype(np.int64))
                  // (CHUNKS * LANE)),
                -(-bcnt // (CHUNKS * LANE)))
            keep = layer < cap[binv]
        else:
            keep = layer < 1
        try:
            plans.append(WindowEllPlan.build(
                coords_csr(r[keep], c32[keep], v[keep]), split_rows=None,
                step_groups=step_groups, sup=s,
                cap_slack=8 if narrow else 2, device=device,
                permute_rows=permute_rows))
        except WindowEllOverflow:
            break                     # whole remainder to the flat tail
        spill = ~keep
        if not spill.any():
            done = True
            break
        r, c64, c32, v = r[spill], c64[spill], c32[spill], v[spill]
    if not plans:
        raise WindowEllOverflow(
            "no composite level packs this structure")
    tail = None if done or not len(r) \
        else coords_csr(r, c32, v).to_device(device)
    return CompositePlan(plans=tuple(plans), tail=tail,
                        num_rows=csr.num_rows, num_cols=csr.num_cols)


@jax.jit
def spmv_composite(cp: CompositePlan, x: jax.Array) -> jax.Array:
    """``y = A @ x`` over a composite plan: sum of the level kernels plus
    the flat remainder."""
    x = jnp.asarray(x, jnp.float32)
    y = spmv_window_ell(cp.plans[0], x)
    for p in cp.plans[1:]:
        y = y + spmv_window_ell(p, x)
    if cp.tail is not None:
        from .scalar import pad_x, spmv_csr_scalar

        y = y + spmv_csr_scalar(
            cp.tail, pad_x(x, _bucket(max(cp.tail.num_cols, 1))),
        )[: cp.num_rows]
    return y


# ---- banded plans: row bands as independent plans (guard-bounded scale) --

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BandedPlan:
    """A row-banded stack of window-ELL plans, outputs concatenated.

    A single plan's per-group SMEM window table caps ``n_groups`` at
    ``MAX_GROUPS`` and the resident output block caps rows+extras by
    VMEM.  At web-graph scale (1M rows) those guards force the WIDE
    superblock (sup=16384, 128 scatter targets at ~0.55 ps/slot/target)
    even when the slot accounting favors sup=4096 — the mid mode needs
    ~300K groups there (benchmarks/sweep_caps_wide.py).  Banding the
    ROWS restores the choice: each band is its own complete plan
    (splits, spill extras and the in-kernel combine all confined to the
    band), ``y = concat(band_i(x))``, ``x`` shared by every band.  The
    only re-streamed bytes are the x gather block (``cols*4`` B per
    extra band — noise against the GB-scale packed stream).

    Like the reference's merge-path splitting this is a load-shaping
    transform of the SAME kernel, not a new kernel
    (``/root/reference/src/spmv_kernels.cu:75-130``).
    """

    plans: tuple             # WindowEllPlan per band, in row order
    num_rows: int
    num_cols: int
    # real rows per band: bands are padded with EMPTY rows to a common
    # height so every band shares one compiled kernel variant (the
    # pallas cache keys on out8/e8/n_steps; ~100 s Mosaic compile per
    # extra variant), and the concat trims each band back
    band_rows: tuple = ()

    def tree_flatten(self):
        return ((self.plans,),
                (self.num_rows, self.num_cols, self.band_rows))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(tuple(children[0]), *aux)

    @property
    def n_groups(self) -> int:
        return sum(p.n_groups for p in self.plans)

    @property
    def sup(self) -> int:
        return max(p.sup for p in self.plans)

    @property
    def occupancy(self) -> float:
        tot = sum(p.n_groups * CHUNKS * LANE for p in self.plans)
        nnz = sum(float(p.occupancy) * p.n_groups * CHUNKS * LANE
                  for p in self.plans)
        return nnz / tot if tot else 0.0

    @property
    def sbn(self) -> bool:
        return all(p.sbn for p in self.plans)

    def save(self, path: str) -> None:
        from ..plan_io import save_plan

        save_plan(self, path)

    @staticmethod
    def load(path: str, device=None) -> "BandedPlan":
        from ..plan_io import load_plan

        plan = load_plan(path, device=device)
        if not isinstance(plan, BandedPlan):
            raise InvalidFormatError(
                f"{path}: holds a {type(plan).__name__}, not a BandedPlan")
        return plan


def _bands_from_overflow(e: WindowEllOverflow) -> int:
    """Band count suggested by an overflow's sizing hints (0/1 = banding
    cannot help: inflation guard, or the x block alone blows VMEM)."""
    n_bands = 1
    if getattr(e, "needed_groups", 0):
        n_bands = max(n_bands, -(-int(e.needed_groups * 1.1)
                                 // int(MAX_GROUPS * 0.9)))
    if getattr(e, "vmem_var", 0):
        head = VMEM_BUDGET - getattr(e, "vmem_fixed", 0)
        if head <= 0:
            return 0  # x block alone blows VMEM — banding cannot help
        n_bands = max(n_bands, -(-int(e.vmem_var * 1.15) // head))
    return n_bands


def _slice_rows(csr: CSRMatrix, a: int, b: int,
                pad_to: int | None = None) -> CSRMatrix:
    """The row band ``[a, b)`` as an independent CSR (same cols),
    optionally padded with trailing EMPTY rows to ``pad_to`` rows."""
    lo, hi = int(csr.row_ptrs[a]), int(csr.row_ptrs[b])
    h = b - a
    n = max(pad_to or h, h)
    ptr = np.empty(n + 1, np.int32)
    ptr[:h + 1] = (csr.row_ptrs[a:b + 1].astype(np.int64)
                   - lo).astype(np.int32)
    ptr[h + 1:] = ptr[h]
    return CSRMatrix(n, csr.num_cols, csr.values[lo:hi],
                     csr.col_indices[lo:hi], ptr)


def build_banded(csr: CSRMatrix, sup: int, n_bands: int | None = None,
                 split_rows: int | None = None,
                 step_groups: int | None = None,
                 cap_slack: int | None = None,
                 spill_beta: float | None = None,
                 device=None, permute_rows: bool = False,
                 pattern: bool = False,
                 values_dtype=np.float32) -> BandedPlan:
    """Build a :class:`BandedPlan` at the given superblock height.

    ``n_bands=None`` sizes the bands adaptively: a first full-matrix
    attempt either fits (one band) or raises with sizing hints
    (``needed_groups`` / ``vmem_var``) that determine the split; any
    band that still overflows is halved recursively.  Bands are cut at
    multiples of ``sup`` so superblock fill stays even.  Raises
    :class:`WindowEllOverflow` when a single-superblock band still
    cannot fit (structure too adversarial — callers fall back).

    Defaults (``cap_slack=None`` / ``spill_beta=None`` → the measured
    per-height resolution, :func:`_auto_caps`) match
    :meth:`WindowEllPlan.build`, so the two builders produce the same
    per-band layouts for a matrix that fits in one band.
    """
    kw = dict(split_rows=split_rows, step_groups=step_groups,
              cap_slack=cap_slack, spill_beta=spill_beta, device=device,
              permute_rows=permute_rows, pattern=pattern,
              values_dtype=values_dtype)
    if n_bands is None:
        try:
            p = WindowEllPlan.build(csr, sup=sup, **kw)
            return BandedPlan(plans=(p,), num_rows=csr.num_rows,
                              num_cols=csr.num_cols,
                              band_rows=(csr.num_rows,))
        except WindowEllOverflow as e:
            n_bands = _bands_from_overflow(e)
            if n_bands < 2:
                raise  # inflation guard or similar — banding cannot help
    n_sups = -(-csr.num_rows // sup)
    n_bands = max(1, min(n_bands, n_sups))
    # initial cuts: equal sup counts per band
    cuts = [min(csr.num_rows, sup * (n_sups * i // n_bands))
            for i in range(n_bands + 1)]
    todo = [(cuts[i], cuts[i + 1]) for i in range(n_bands)
            if cuts[i] < cuts[i + 1]]
    if not todo:
        # zero-row matrix: one (empty) band — WindowEllPlan.build
        # handles rows=0, and the cut/halving machinery below assumes
        # at least one non-empty band
        p = WindowEllPlan.build(csr, sup=sup, **kw)
        return BandedPlan(plans=(p,), num_rows=csr.num_rows,
                          num_cols=csr.num_cols,
                          band_rows=(csr.num_rows,))
    # common band height: bands padded with empty rows to it share one
    # compiled kernel variant (the pallas cache keys on out8, which is
    # band-height-dominated; ~100 s Mosaic compile per extra variant)
    bh = max(b - a for a, b in todo)
    plans, band_rows, done_rows = [], [], 0
    while todo:
        a, b = todo.pop(0)
        try:
            try:
                p = WindowEllPlan.build(
                    _slice_rows(csr, a, b, pad_to=bh), sup=sup, **kw)
            except WindowEllOverflow:
                if b - a >= bh:
                    raise
                # height padding tipped this band over VMEM — keep its
                # real height (own compile variant, but it fits)
                p = WindowEllPlan.build(_slice_rows(csr, a, b),
                                        sup=sup, **kw)
            plans.append(p)
            band_rows.append(b - a)
            done_rows = b
        except WindowEllOverflow:
            if b - a <= sup:
                raise
            mid = a + sup * (-(-(b - a) // sup) // 2)
            todo[:0] = [(a, mid), (mid, b)]
    assert done_rows == csr.num_rows
    return BandedPlan(plans=tuple(plans), num_rows=csr.num_rows,
                      num_cols=csr.num_cols, band_rows=tuple(band_rows))


@jax.jit
def spmv_banded(bp: BandedPlan, x: jax.Array) -> jax.Array:
    """``y = A @ x`` over a banded plan: per-band kernels, concatenated
    (each band's output trimmed back from its padded common height)."""
    x = jnp.asarray(x, jnp.float32)
    rows = bp.band_rows or tuple(p.num_rows for p in bp.plans)
    # band_rows=() on a plan whose bands WERE height-padded would
    # silently interleave the pad rows into y — reject any stack whose
    # real heights cannot reassemble num_rows (trace-time check)
    if len(rows) != len(bp.plans) or sum(rows) != bp.num_rows:
        raise InvalidFormatError(
            f"BandedPlan band_rows {tuple(rows)} do not partition "
            f"num_rows={bp.num_rows} across {len(bp.plans)} bands")
    ys = [spmv_window_ell(p, x)[:r] for p, r in zip(bp.plans, rows)]
    return ys[0] if len(ys) == 1 else jnp.concatenate(ys)


def build_auto(csr: CSRMatrix, split_rows: int | None = None,
               step_groups: int | None = None,
               choice: tuple | None = None,
               device=None, permute_rows: bool | None = None,
               pattern: bool = False, values_dtype=np.float32):
    """Resolve the best packed layout for ``csr``: a single
    :class:`WindowEllPlan` when it fits, else a :class:`BandedPlan` at
    the cost-model superblock before escalating to wider superblocks.

    Returns ``(kernel_fn, plan)`` — the dispatch-facing entry
    (``spmv.py`` C12).  The escalation order matters: banding at the
    cost-model's preferred height beats escalating to the next height
    whenever the model's scatter-cost ordering holds (a 4096-row band
    plan scatters at ~1/3 the per-slot cost of a 16384 single plan —
    docs/PERF.md scatter table), so banding is tried FIRST at each
    level.
    """
    if permute_rows is None:
        permute_rows = _permute_default()
    start, groups_est = choice if choice is not None \
        else _choose_sup(csr, with_groups=True, split_rows=split_rows)
    err = None
    for s in SUP_LEVELS[SUP_LEVELS.index(start):]:
        narrow = s == SUP_LEVELS[0]
        # order-statistic spill caps at every height (narrow defaults
        # inside _build; wide heights need beta explicit): with banding
        # lifting the SMEM cap, the beta caps' smaller slot counts win
        # at wide superblocks too (262K web graph, legacy slack-2 margin
        # caps vs beta slack-1: 46416 -> 31928 groups)
        beta, slack = _auto_caps(s)
        split = split_rows if narrow else None
        # pre-size bands when the sampled model already says the single
        # plan cannot fit SMEM — skips a doomed full-matrix build (the
        # estimate only applies to the model's chosen height)
        nb0 = 0
        if s == start and groups_est > MAX_GROUPS and csr.num_rows > s:
            # 1.25 margin: over-banding costs one extra x-block stream
            # per band; an under-banded attempt costs a rebuilt band
            nb0 = -(-int(groups_est * 1.25) // int(MAX_GROUPS * 0.9))
        try:
            if nb0 >= 2:
                bp = build_banded(
                    csr, sup=s, n_bands=nb0, split_rows=split,
                    step_groups=step_groups, cap_slack=slack,
                    spill_beta=beta, device=device,
                    permute_rows=permute_rows, pattern=pattern,
                    values_dtype=values_dtype)
                return (spmv_banded, bp) if len(bp.plans) > 1 \
                    else (spmv_window_ell, bp.plans[0])
            p = WindowEllPlan.build(
                csr, split_rows=split, step_groups=step_groups,
                cap_slack=slack, sup=s, spill_beta=beta, device=device,
                permute_rows=permute_rows, pattern=pattern,
                values_dtype=values_dtype)
            return spmv_window_ell, p
        except WindowEllOverflow as e:
            err = e
            if nb0 >= 2:
                # the pre-sized BANDED attempt failed, which means the
                # recursive halving already bottomed out at a
                # single-superblock band — any n_bands re-try converges
                # to the same band and fails identically; escalate
                continue
            nb = _bands_from_overflow(e)
            if csr.num_rows <= s or nb < 2:
                continue  # banding cannot help at this height
            try:
                bp = build_banded(
                    csr, sup=s, n_bands=nb, split_rows=split,
                    step_groups=step_groups, cap_slack=slack,
                    spill_beta=beta, device=device,
                    permute_rows=permute_rows, pattern=pattern,
                    values_dtype=values_dtype)
                return spmv_banded, bp
            except WindowEllOverflow as e2:
                err = e2
    raise err
