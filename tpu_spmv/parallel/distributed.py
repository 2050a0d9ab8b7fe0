"""Multi-chip distributed SpMV (new component — no reference counterpart).

The reference is strictly single-GPU (no MPI/NCCL anywhere; device 0
hardcoded, ``bandwidth.cpp:9``).  This layer adds the scale-out dimension
mandated by the TPU build targets (BASELINE.md: ≥70% nnz/s scaling 1→4
hosts): **1D row partitioning** of CSR over a ``jax.sharding.Mesh`` with
``shard_map``.

Design (the "how to scale" recipe: pick a mesh, annotate shardings, let XLA
insert collectives):

* the matrix is split into equal row blocks, one per mesh slot along the
  ``rows`` axis; each shard's nnz arrays are padded to a common bucket so
  the stacked ``(n_shards, nnz_pad)`` arrays are static-shaped and shard
  exactly one block per device;
* the operand ``x`` is either **replicated** (power-law column footprints
  make row shards read nearly all of x, so replication is the honest
  default for that class) or **ring-exchanged** (round 3,
  :func:`shard_csr_ring` / :func:`spmv_csr_ring`): x stays row-sharded,
  each shard packs the slice of its block other shards reference, and
  the packed slices rotate via ``lax.ppermute`` between per-pair packed
  kernels (hiding the hops behind compute is a real-ICI property —
  ``benchmarks/overlap.py`` records the measured budget) — see
  :func:`ring_traffic_report` and docs/TRAFFIC.md;
* each device runs the **full packed Pallas kernel** on its row block
  (:func:`shard_csr_packed` / :func:`spmv_csr_sharded_packed`; the flat
  gather+segment-sum pair :func:`shard_csr` / :func:`spmv_csr_sharded`
  remains as the fallback for structures the packed layout rejects) —
  zero cross-device traffic in the SpMV itself; the only collectives are
  the all-gather XLA inserts when a replicated consumer (e.g. the PageRank
  update) reads the row-sharded ``y``, riding ICI.

Correctness oracle: the same CPU reference (``spmv_cpu.cpp:6-16``) on the
unpartitioned matrix, at the reference property-test tolerances.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8 promotes shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..csr import CSRMatrix, _bucket
from ..errors import InvalidArgumentError


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bootstrap (SURVEY §2/§5 checklist): wire this process
    into the cluster so ``jax.devices()`` spans every host's chips and the
    row mesh below stretches across DCN.

    On single-process runs (tests, one host) this is a no-op unless the
    standard cluster environment variables are present.  Call once before
    any other JAX work, mirroring ``jax.distributed.initialize`` docs.
    """
    import os

    if coordinator_address is None and num_processes is None \
            and "JAX_COORDINATOR_ADDRESS" not in os.environ \
            and "COORDINATOR_ADDRESS" not in os.environ:
        return  # single-process: nothing to bootstrap
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def _nnz_balanced_bounds(row_ptrs: np.ndarray, n_shards: int) -> np.ndarray:
    """Row partition bounds with near-equal nnz per shard.

    Round 1 split rows into equal COUNTS, so on power-law graphs one shard
    owned most of the nnz and bounded the step time (VERDICT Weak #5).
    Equal-work partitioning is the merge-path idea applied across chips:
    cut at the nnz quantiles via searchsorted on the row-pointer prefix
    sums (the same structure ``merge_path_search`` binary-searches,
    ``spmv_kernels.cu:48-72``).
    """
    rows = len(row_ptrs) - 1
    nnz = int(row_ptrs[-1])
    targets = (np.arange(1, n_shards, dtype=np.int64) * nnz) // n_shards
    cuts = np.searchsorted(row_ptrs, targets, side="left")
    bounds = np.concatenate([[0], cuts, [rows]]).astype(np.int64)
    return np.maximum.accumulate(bounds)


def _stitch_rows(y_padded, bounds: tuple, rps: int):
    """Reassemble the true-order y from the padded per-shard frame: each
    shard's valid prefix is a static contiguous slice, so this is a few
    vectorized copies — no elementwise gather."""
    parts = []
    for d in range(len(bounds) - 1):
        length = int(bounds[d + 1] - bounds[d])
        if length:
            parts.append(
                jax.lax.dynamic_slice_in_dim(y_padded, d * rps, length))
    if not parts:
        return y_padded[:0]
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


def make_row_mesh(n_devices: int | None = None,
                  axis_name: str = "rows") -> Mesh:
    """A 1D device mesh over the first ``n_devices`` local devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise InvalidArgumentError(
            f"requested {n_devices} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_devices]), (axis_name,))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ShardedCSR:
    """Row-partitioned CSR: stacked per-shard padded arrays.

    ``values/col_indices/row_ids`` are ``(n_shards, nnz_pad)``; ``row_ids``
    are shard-local.  Padding nnz carry value 0 and point at the shard's
    last local row.
    """

    values: jax.Array       # f32 (n_shards, nnz_pad)
    col_indices: jax.Array  # i32 (n_shards, nnz_pad)
    row_ids: jax.Array      # i32 (n_shards, nnz_pad), local
    num_rows: int
    num_cols: int
    nnz: int
    rows_per_shard: int     # padded per-shard frame height
    bounds: tuple           # global row bounds per shard (n_shards + 1)
    shard_nnz: tuple = ()   # per-shard nnz (diagnostics)

    @property
    def n_shards(self) -> int:
        return int(self.values.shape[0])

    @property
    def nnz_imbalance(self) -> float:
        """max/mean − 1 of per-shard nnz (0 = perfectly balanced)."""
        return _imbalance_of(self.shard_nnz)

    def tree_flatten(self):
        return (self.values, self.col_indices, self.row_ids), \
            (self.num_rows, self.num_cols, self.nnz, self.rows_per_shard,
             self.bounds, self.shard_nnz)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)


def _imbalance_of(shard_nnz: tuple) -> float:
    s = np.asarray(shard_nnz, np.float64)
    if s.size == 0 or s.mean() == 0:
        return 0.0
    return float(s.max() / s.mean() - 1.0)


def shard_csr(A: CSRMatrix, mesh: Mesh,
              axis_name: str = "rows") -> ShardedCSR:
    """Partition a host CSR matrix into nnz-balanced row blocks over
    ``mesh`` and place each block on its device.  Shards own differing
    row counts inside a common padded frame (``rows_per_shard``);
    :func:`_stitch_rows` reassembles the true-order result from a few
    static contiguous slices."""
    n_shards = int(mesh.shape[axis_name])
    rows = A.num_rows
    ptr = A.row_ptrs
    bounds = _nnz_balanced_bounds(ptr, n_shards)
    rps = max(int(np.diff(bounds).max(initial=0)), 1)
    shard_nnz = ptr[bounds[1:]] - ptr[bounds[:-1]]
    nnz_pad = _bucket(int(shard_nnz.max(initial=0)))

    values = np.zeros((n_shards, nnz_pad), np.float32)
    cols = np.zeros((n_shards, nnz_pad), np.int32)
    rids = np.full((n_shards, nnz_pad), rps - 1, np.int32)
    for d in range(n_shards):
        lo, hi = int(ptr[bounds[d]]), int(ptr[bounds[d + 1]])
        k = hi - lo
        if k:
            values[d, :k] = A.values[lo:hi]
            cols[d, :k] = A.col_indices[lo:hi]
            local_rows = np.repeat(
                np.arange(bounds[d], bounds[d + 1], dtype=np.int32)
                - bounds[d],
                np.diff(ptr[bounds[d]:bounds[d + 1] + 1]))
            rids[d, :k] = local_rows

    sharding = NamedSharding(mesh, P(axis_name, None))
    return ShardedCSR(
        values=jax.device_put(jnp.asarray(values), sharding),
        col_indices=jax.device_put(jnp.asarray(cols), sharding),
        row_ids=jax.device_put(jnp.asarray(rids), sharding),
        num_rows=rows,
        num_cols=A.num_cols,
        nnz=A.nnz,
        rows_per_shard=rps,
        bounds=tuple(int(b) for b in bounds),
        shard_nnz=tuple(int(v) for v in shard_nnz),
    )


def _local_spmv(vals, cols, rids, x, rows_per_shard):
    """Per-device flat SpMV on the local row block (shapes carry a leading
    local-shard dim of 1 inside shard_map)."""
    g = jnp.take(x, cols[0], mode="clip")
    y = jax.ops.segment_sum(vals[0] * g, rids[0],
                            num_segments=rows_per_shard,
                            indices_are_sorted=True)
    return y


@functools.lru_cache(maxsize=32)
def _sharded_spmv_fn(mesh: Mesh, axis_name: str, rows_per_shard: int):
    local = functools.partial(_local_spmv, rows_per_shard=rows_per_shard)
    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None),
                  P(axis_name, None), P()),
        out_specs=P(axis_name),
    )
    return jax.jit(mapped)


def spmv_csr_sharded(sharded: ShardedCSR, x, mesh: Mesh | None = None,
                     axis_name: str = "rows") -> jax.Array:
    """``y = A @ x`` with A row-sharded across the mesh; ``x`` replicated.
    Returns the full ``(num_rows,)`` result (row-sharded layout)."""
    x = jnp.asarray(x, jnp.float32)
    if mesh is None:
        mesh = sharded.values.sharding.mesh
    fn = _sharded_spmv_fn(mesh, axis_name, sharded.rows_per_shard)
    y = fn(sharded.values, sharded.col_indices, sharded.row_ids, x)
    return _stitch_rows(y, sharded.bounds, sharded.rows_per_shard)


def pagerank_sharded(sharded, dangling_mask,
                     config=None, mesh: Mesh | None = None,
                     axis_name: str = "rows"):
    """Fully distributed PageRank: the on-device ``lax.while_loop`` power
    iteration (C15) over the row-sharded SpMV — every iteration's
    all-gather of the row-sharded ``Ar`` back to replicated ranks rides
    ICI; only the final ranks/iteration scalars leave the devices.

    ``dangling_mask`` comes from :func:`tpu_spmv.pagerank.find_dangling_mask`
    on the unpartitioned matrix (a one-time host pass, as in the reference
    ``pagerank.cu:20-48``).
    """
    from ..pagerank import PageRankConfig, PageRankResult

    cfg = config or PageRankConfig()
    packed = isinstance(sharded, ShardedWindowEll)
    if mesh is None:
        arr = sharded.leaves[0] if packed else sharded.values
        mesh = arr.sharding.mesh
    n = sharded.num_rows
    result = PageRankResult()
    if sharded.num_cols != n:
        from ..errors import SpMVError as _E
        result.error_code = int(_E.INVALID_DIMENSION)
        result.final_residual = float("nan")
        return result
    if n == 0:
        result.ranks = jnp.zeros((0,), jnp.float32)
        return result
    bounds, rps = sharded.bounds, sharded.rows_per_shard
    if packed:
        packed_fn = _sharded_packed_fn(mesh, axis_name, sharded.plan_aux,
                                       sharded.has_lam)
        scale = sharded.col_scale   # pattern shardings pre-scale ranks
        spmv_args = sharded.stacked_leaves
        spmv = lambda r, args: _stitch_rows(
            packed_fn(r if scale is None else r * scale, *args),
            bounds, rps)[:n]
    else:
        flat_fn = _sharded_spmv_fn(mesh, axis_name, sharded.rows_per_shard)
        spmv_args = (sharded.values, sharded.col_indices, sharded.row_ids)
        spmv = lambda r, args: _stitch_rows(flat_fn(*args, r),
                                            bounds, rps)[:n]
    mask = jnp.asarray(np.asarray(dangling_mask, np.float32)[:n])
    damping = float(cfg.damping_factor)
    tol = float(cfg.tolerance)
    max_it = int(cfg.max_iterations)
    inv_n = 1.0 / n

    @jax.jit
    def run(mask, *args):
        r0 = jnp.full((n,), inv_n, jnp.float32)

        def cond(state):
            it, _, residual = state
            return jnp.logical_and(it < max_it, residual >= tol)

        def body(state):
            it, r_old, _ = state
            Ar = spmv(r_old, args)
            dangling_sum = jnp.dot(mask, r_old)
            r_new = damping * Ar + damping * dangling_sum * inv_n \
                + (1.0 - damping) * inv_n
            residual = jnp.sqrt(jnp.sum((r_new - r_old) ** 2))
            return (it + 1, r_new, residual)

        it, ranks, residual = jax.lax.while_loop(
            cond, body, (jnp.int32(0), r0, jnp.float32(jnp.inf)))
        total = jnp.sum(ranks)
        ranks = jnp.where(total > 0.0, ranks / total, ranks)
        return it, ranks, residual

    it, ranks, residual = run(mask, *spmv_args)
    result.ranks = ranks
    result.iterations = int(it)
    result.final_residual = float(residual)
    result.converged = result.final_residual < tol
    return result


def pagerank_step_sharded(sharded: ShardedCSR, ranks: jax.Array,
                          dangling_mask: jax.Array, damping: float = 0.85,
                          mesh: Mesh | None = None,
                          axis_name: str = "rows") -> jax.Array:
    """One distributed PageRank power iteration: row-sharded SpMV + fused
    teleport/dangling update (the multi-chip form of ``pagerank.cu:93-132``).
    The all-gather of the row-sharded ``Ar`` back to the replicated ``ranks``
    layout is inserted by XLA and rides ICI."""
    n = sharded.num_rows
    Ar = spmv_csr_sharded(sharded, ranks, mesh, axis_name)
    dangling_sum = jnp.dot(dangling_mask[:n], ranks[:n])
    return damping * Ar + damping * dangling_sum / n + (1.0 - damping) / n


# ---- packed-kernel sharding: the Pallas window-ELL kernel per shard ----

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ShardedWindowEll:
    """Row-partitioned window-ELL plans, stacked and device-sharded.

    Each shard owns a contiguous row block packed by the same
    :class:`~tpu_spmv.kernels.window_ell.WindowEllPlan` builder used on a
    single chip; per-shard plan arrays are padded to common shapes (steps
    padded with no-op repeats, groups with zero slots) so the stacked
    ``(n_shards, ...)`` arrays shard exactly one plan per device, and the
    local compute inside ``shard_map`` is the full Pallas kernel — not a
    degraded flat path.
    """

    leaves: tuple            # stacked per-shard plan leaves; PATTERN
    #   shardings (plan_aux pat flag) append one replicated leaf: the
    #   per-column scale s of A = B·diag(s), applied to x before the
    #   kernels (the plans themselves stream no f32 values)
    plan_aux: tuple          # common WindowEllPlan aux data
    num_rows: int
    num_cols: int
    nnz: int
    rows_per_shard: int      # padded per-shard frame height
    bounds: tuple            # global row bounds per shard (n_shards + 1)
    shard_nnz: tuple = ()    # per-shard nnz (diagnostics)

    @property
    def nnz_imbalance(self) -> float:
        return _imbalance_of(self.shard_nnz)

    def tree_flatten(self):
        return self.leaves, (self.plan_aux, self.num_rows, self.num_cols,
                             self.nnz, self.rows_per_shard, self.bounds,
                             self.shard_nnz)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(tuple(leaves), *aux)

    @property
    def n_shards(self) -> int:
        return int(self.leaves[0].shape[0])

    @property
    def pat(self) -> bool:
        return bool(self.plan_aux[12])   # aux: (..., sbn, pat, tb)

    @property
    def col_scale(self):
        """Replicated per-column scale for pattern shardings, else None."""
        return self.leaves[-1] if self.pat else None

    @property
    def stacked_leaves(self) -> tuple:
        """The per-shard stacked plan leaves (scale leaf excluded)."""
        return self.leaves[:-1] if self.pat else self.leaves

    @property
    def has_lam(self) -> bool:
        """True when shard plans carry the row-leveling inverse leaf."""
        return len(self.stacked_leaves) > (7 if self.pat else 8)


def _stack_plans(plans, rps: int, num_cols: int):
    """Pad a list of WindowEllPlans to common leaf shapes (no-op
    semantics: ``blk_step`` -> -1 dead steps, ``fin_step`` -> 0, slot
    arrays -> zero slots) and stack them, returning ``(stacked, aux)``
    where ``aux`` is the shared static tuple every padded plan
    reconstructs under (``extras_base`` depends only on ``rps``, so it is
    plan-invariant; ``e8``/``out8``/``n_extra`` take the maxima)."""
    e8 = max(p.e8 for p in plans)
    out8 = max(p.out8 for p in plans)
    n_steps = max(p.n_steps for p in plans)
    n_grows = max(int(p.lo.shape[0]) for p in plans)  # vals None when pat
    n_sbrows = max(int(p.sb.shape[0]) for p in plans)  # halved when sbn
    n_wg = max(int(p.wg.shape[0]) for p in plans)
    n_extra = max(p.n_extra for p in plans)
    # the stacked frame requires a uniform leaf SET across shards
    assert all(p.pat == plans[0].pat for p in plans)
    assert all((p.lam is None) == (plans[0].lam is None) for p in plans)
    assert all(p.tb == plans[0].tb for p in plans)
    # shared static params are taken from plans[0]; a shard whose builder
    # picked a different sup level / step width would reconstruct wrong
    assert all(p.sup == plans[0].sup and p.step_groups == plans[0].step_groups
               and p.split_rows == plans[0].split_rows
               and p.sbn == plans[0].sbn for p in plans)

    def pad_plan(p):
        def pad2(a, n):  # zero-pad rows of (G8, 128) arrays
            a = np.asarray(a)
            return np.pad(a, ((0, n - a.shape[0]), (0, 0)))

        def pad1(a, n, fill):
            a = np.asarray(a)
            if len(a) == n:
                return a
            return np.concatenate([a, np.full(n - len(a), fill, a.dtype)])

        lo = pad2(p.lo, n_grows)
        sb = pad2(p.sb, n_sbrows)
        wg = pad1(p.wg, n_wg, 0)
        base = pad1(p.base, n_wg // p.tb, 0)
        blk = pad1(p.blk_step, n_steps, -1)
        fin = pad1(p.fin_step, n_steps, 0)
        e2r = np.zeros(max(n_extra, 1), np.int32)
        e2r[: p.n_extra] = np.asarray(p.extra_to_row)
        out = () if p.pat else (pad2(p.vals, n_grows),)
        out += (lo, sb, wg, base, blk, fin, e2r)
        if p.lam is not None:   # identical shapes: every shard is rps tall
            out += (np.asarray(p.lam),)
        return out

    stacked = [np.stack(arrs)
               for arrs in zip(*(pad_plan(p) for p in plans))]
    p0 = plans[0]
    plan_aux = (rps, num_cols, p0.extras_base, n_extra, e8, out8,
                p0.cols_pad, p0.step_groups, p0.split_rows, p0.sup, 0.0,
                p0.sbn, p0.pat, p0.tb)
    return stacked, plan_aux


def shard_csr_packed(A: CSRMatrix, mesh: Mesh, axis_name: str = "rows",
                     split_rows: int | None = 128,
                     pattern: bool = False,
                     permute_rows: bool = False,
                     values_dtype=np.float32) -> ShardedWindowEll:
    """Partition rows over ``mesh`` and pack each block with the window-ELL
    planner.  Raises :class:`WindowEllOverflow` (propagated) if any shard's
    structure rejects the packed layout — callers fall back to
    :func:`shard_csr` + the flat path.

    ``pattern=True`` requires ``A = B·diag(s)`` (every column's stored
    values identical — :func:`tpu_spmv.pagerank.column_scale_factor`);
    shard plans then stream no f32 values and the replicated scale rides
    the sharding, applied to x before the kernels.  ``permute_rows``
    levels each shard's rows onto lanes (the per-shard inverse runs
    inside the local kernel dispatch, so stitching is unchanged)."""
    from ..kernels.window_ell import WindowEllPlan, _choose_sup

    col_scale = None
    if pattern:
        from ..pagerank import column_scale_factor

        col_scale = column_scale_factor(A)
        if col_scale is None:
            from ..errors import InvalidFormatError

            raise InvalidFormatError(
                "shard_csr_packed(pattern=True): matrix values are not "
                "column-scaled (A = B*diag(s) does not hold)")

    n_shards = int(mesh.shape[axis_name])
    rows = A.num_rows
    ptr = A.row_ptrs
    bounds = _nnz_balanced_bounds(ptr, n_shards)
    rps = max(int(np.diff(bounds).max(initial=0)), 1)
    # the superblock height is part of the kernel's static signature, so
    # pick it once from the whole matrix and build every shard with it
    sup = _choose_sup(A)
    plans = []
    for d in range(n_shards):
        r0, r1 = int(bounds[d]), int(bounds[d + 1])
        lo, hi = int(ptr[r0]), int(ptr[r1])
        local_ptr = np.zeros(rps + 1, np.int32)
        local_ptr[: r1 - r0 + 1] = ptr[r0:r1 + 1] - ptr[r0]
        local_ptr[r1 - r0 + 1:] = local_ptr[r1 - r0]
        sub = CSRMatrix(rps, A.num_cols, A.values[lo:hi],
                        A.col_indices[lo:hi], local_ptr)
        plans.append(WindowEllPlan.build(sub, split_rows=split_rows,
                                         sup=sup, pattern=pattern,
                                         permute_rows=permute_rows,
                                         values_dtype=values_dtype))

    stacked, plan_aux = _stack_plans(plans, rps, A.num_cols)
    leaves = tuple(
        jax.device_put(jnp.asarray(a),
                       NamedSharding(mesh, P(axis_name,
                                             *([None] * (a.ndim - 1)))))
        for a in stacked)
    if pattern:
        leaves += (jax.device_put(jnp.asarray(col_scale),
                                  NamedSharding(mesh, P())),)
    shard_nnz = ptr[bounds[1:]] - ptr[bounds[:-1]]
    return ShardedWindowEll(leaves=leaves, plan_aux=plan_aux,
                            num_rows=rows, num_cols=A.num_cols, nnz=A.nnz,
                            rows_per_shard=rps,
                            bounds=tuple(int(b) for b in bounds),
                            shard_nnz=tuple(int(v) for v in shard_nnz))


@functools.lru_cache(maxsize=32)
def _sharded_packed_fn(mesh: Mesh, axis_name: str, plan_aux: tuple,
                       has_lam: bool = False):
    from ..kernels.window_ell import WindowEllPlan, _spmv_window_ell, \
        _use_interpret

    # check_vma is ON whenever the kernel lowers through Mosaic: the
    # pallas_call's out-struct carries the varying-axes annotation
    # (window_ell._build_pallas vma parameter).  Interpret mode (the
    # virtual CPU mesh in tests) keeps it off — jax's HLO interpreter
    # inlines the kernel, whose scalar constants have no vma, and rejects
    # the mixed-vma arithmetic (verified on jax 0.9).
    interp = _use_interpret()
    vma = None if interp else frozenset({axis_name})
    pat = bool(plan_aux[12])   # aux: (..., sbn, pat, tb)
    # plan children order: (vals, lo, sb, wg, base, blk, fin, e2r, lam);
    # the stacked frame omits vals for pattern plans and appends lam for
    # leveled ones
    n_leaves = 8 - (1 if pat else 0) + (1 if has_lam else 0)

    def local(x, *leaves):
        ls = [a[0] for a in leaves]
        lam = ls.pop() if has_lam else None
        children = ([None] if pat else [ls.pop(0)]) + ls + [lam]
        plan = WindowEllPlan.tree_unflatten(plan_aux, tuple(children))
        if vma is not None:
            # promote the replicated x to varying so every pallas operand
            # carries the same manual axes
            x = jax.lax.pvary(x, axis_name)
        return _spmv_window_ell(plan, x, vma=vma)

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(),) + tuple(P(axis_name) for _ in range(n_leaves)),
        out_specs=P(axis_name),
        check_vma=not interp,
    )
    return jax.jit(mapped)


def spmv_csr_sharded_packed(sp: ShardedWindowEll, x,
                            mesh: Mesh | None = None,
                            axis_name: str = "rows") -> jax.Array:
    """``y = A @ x`` with each row shard running the packed Pallas kernel;
    ``x`` replicated.  Returns the row-sharded ``(num_rows,)`` result.
    Pattern shardings pre-scale x by the replicated column scale."""
    x = jnp.asarray(x, jnp.float32)
    if sp.col_scale is not None:
        x = x * sp.col_scale
    if mesh is None:
        mesh = sp.leaves[0].sharding.mesh
    fn = _sharded_packed_fn(mesh, axis_name, sp.plan_aux, sp.has_lam)
    y = fn(x, *sp.stacked_leaves)
    return _stitch_rows(y, sp.bounds, sp.rows_per_shard)


# ---- ring-pipelined x exchange (round 3: stop replicating x) ----
#
# The replicated path ships ALL of x to every shard up front (an
# all-gather's worth of DCN/ICI traffic, serialized before compute).
# The ring path keeps x row-sharded like the matrix: each shard packs
# the slice of its x block that OTHER shards actually reference (the
# column footprint — hub columns naturally included, private columns
# never travel), and the packed slices rotate around the mesh with
# ``lax.ppermute`` while each shard runs the packed Pallas kernel on
# the block-pair plan for the slice it currently holds — the classic
# ring SpMV.  Whether XLA's async collectives actually hide the hops
# behind compute is a REAL-ICI property this environment cannot time;
# ``benchmarks/overlap.py`` records the measured single-chip floor and
# the ICI hiding budget (hop bytes / link bandwidth vs pair-kernel
# time), and :func:`ring_traffic_report` gives the byte model that
# decides when this beats replication.


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class RingShardedCSR:
    """Row-partitioned CSR with per-(shard, source) block-pair plans.

    ``diag_leaves`` hold each shard's plan for its own column block
    (computed from the local x, no communication); ``ring_leaves`` hold,
    per shard, the ``n-1`` plans for the successive sources in ring
    order (step ``r`` uses source ``(d - r) mod n``), built against the
    source's PACKED column footprint.  ``pack_idx`` are the block-local
    column indices each shard packs before the rotation."""

    diag_leaves: tuple
    diag_aux: tuple
    ring_leaves: tuple       # stacked (n, n-1, ...)
    ring_aux: tuple
    pack_idx: jax.Array      # i32 (n, u_max) block-local columns
    num_rows: int
    num_cols: int
    nnz: int
    rows_per_shard: int
    cols_per_shard: int
    u_max: int
    bounds: tuple            # row bounds (n+1)
    col_bounds: tuple        # x block bounds (n+1)
    shard_nnz: tuple = ()
    pack_len: tuple = ()     # true footprint size per source block

    @property
    def n_shards(self) -> int:
        return int(self.pack_idx.shape[0])

    @property
    def nnz_imbalance(self) -> float:
        return _imbalance_of(self.shard_nnz)

    def tree_flatten(self):
        return (self.diag_leaves, self.ring_leaves, self.pack_idx), \
            (self.diag_aux, self.ring_aux, self.num_rows, self.num_cols,
             self.nnz, self.rows_per_shard, self.cols_per_shard,
             self.u_max, self.bounds, self.col_bounds, self.shard_nnz,
             self.pack_len)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(tuple(children[0]), aux[0], tuple(children[1]), aux[1],
                   children[2], *aux[2:])


def _sub_block_csr(A: CSRMatrix, r0: int, r1: int, rps: int,
                   col_sel: np.ndarray, col_map: np.ndarray,
                   num_cols: int) -> CSRMatrix:
    """Rows [r0, r1) of A restricted to the selected columns, with the
    columns remapped through ``col_map`` and the row frame padded to
    ``rps`` rows."""
    ptr = A.row_ptrs
    lo, hi = int(ptr[r0]), int(ptr[r1])
    cols = A.col_indices[lo:hi]
    vals = A.values[lo:hi]
    keep = col_sel[cols]
    rows_of = np.repeat(np.arange(r1 - r0, dtype=np.int64),
                        np.diff(ptr[r0:r1 + 1]).astype(np.int64))[keep]
    new_ptr = np.zeros(rps + 1, np.int32)
    np.cumsum(np.bincount(rows_of, minlength=rps), out=new_ptr[1:])
    return CSRMatrix(rps, num_cols, vals[keep],
                     col_map[cols[keep]].astype(np.int32), new_ptr)


def _ring_max_shards() -> int:
    """Ring mesh-size cap (policy, round 5): the ring form builds
    n*(n-1) block-pair plans and pads ``pack_idx`` to the max footprint
    across sources, so build time and plan bytes grow ~quadratically in
    the mesh size (measured curve: docs/RING_BUILD_r05.json — build
    3.9/15.5/31.3/99.1 s and 0.22/0.32/0.51/0.93 GB of stacked plan
    leaves at n=4/8/16/32 on the 131K/1.5M-nnz web graph, correct at
    every size).  Past the knee the replicated-
    packed form (one plan per shard, O(n)) is the better trade unless
    the structure is strongly banded; callers catch the overflow and
    fall back exactly as they do for structural rejections.  Env
    ``TPU_SPMV_RING_MAX`` overrides for pods whose build hosts can pay
    the quadratic cost for the ICI savings."""
    return int(os.environ.get("TPU_SPMV_RING_MAX", 16))


def shard_csr_ring(A: CSRMatrix, mesh: Mesh, axis_name: str = "rows",
                   split_rows: int | None = 128) -> RingShardedCSR:
    """Build the ring-sharded form: nnz-balanced row blocks, even x
    column blocks, per-(shard, source) packed plans over compressed
    column footprints.  Raises WindowEllOverflow if any pair rejects the
    packed layout — or when the mesh exceeds the quadratic-build cap
    (:func:`_ring_max_shards`) — and callers fall back to the
    replicated paths."""
    from ..kernels.window_ell import WindowEllOverflow, WindowEllPlan

    n = int(mesh.shape[axis_name])
    cap = _ring_max_shards()
    if n > cap:
        raise WindowEllOverflow(
            f"ring sharding builds n*(n-1)={n*(n-1)} block-pair plans; "
            f"mesh size {n} exceeds the quadratic-build cap {cap} "
            f"(TPU_SPMV_RING_MAX) — use the replicated-packed form")
    ptr = A.row_ptrs
    bounds = _nnz_balanced_bounds(ptr, n)
    rps = max(int(np.diff(bounds).max(initial=0)), 1)
    cps = -(-max(A.num_cols, 1) // n)
    col_bounds = np.minimum(np.arange(n + 1, dtype=np.int64) * cps,
                            A.num_cols)

    # column footprints: for each source block e, the set of its columns
    # referenced by any OTHER shard (diagonal use never travels)
    src_of_col = np.minimum(A.col_indices // cps, n - 1).astype(np.int64)
    used = np.zeros((n, A.num_cols), np.bool_)
    for d in range(n):
        lo, hi = int(ptr[bounds[d]]), int(ptr[bounds[d + 1]])
        cols_d = A.col_indices[lo:hi]
        mask = src_of_col[lo:hi] != d
        used[d, cols_d[mask]] = True
    any_used = used.any(axis=0)
    pack_lists = []
    for e in range(n):
        c0, c1 = int(col_bounds[e]), int(col_bounds[e + 1])
        pack_lists.append(np.nonzero(any_used[c0:c1])[0].astype(np.int64))
    u_max = max(max((len(p) for p in pack_lists), default=0), 1)
    # the rotating buffer is an ordinary array — no 1024-column bucket
    # needed (the kernel pads x to cols_pad internally), so keep the
    # padding tiny to preserve the footprint compression
    u_pad = -(-u_max // 8) * 8
    pack_idx = np.zeros((n, u_pad), np.int32)
    col_map = np.zeros(A.num_cols, np.int64)     # global col -> packed
    col_sel_other = np.zeros(A.num_cols, np.bool_)
    for e in range(n):
        c0 = int(col_bounds[e])
        pack_idx[e, : len(pack_lists[e])] = pack_lists[e]
        col_map[c0 + pack_lists[e]] = np.arange(len(pack_lists[e]))
        col_sel_other[c0 + pack_lists[e]] = True

    diag_plans, ring_plans = [], []
    ident = np.arange(A.num_cols, dtype=np.int64)
    for d in range(n):
        r0, r1 = int(bounds[d]), int(bounds[d + 1])
        c0, c1 = int(col_bounds[d]), int(col_bounds[d + 1])
        sel = np.zeros(A.num_cols, np.bool_)
        sel[c0:c1] = True
        sub = _sub_block_csr(A, r0, r1, rps, sel, ident - c0, cps)
        diag_plans.append(WindowEllPlan.build(sub, split_rows=split_rows,
                                              sup=1024))
        steps = []
        for r in range(1, n):
            e = (d - r) % n
            e0, e1 = int(col_bounds[e]), int(col_bounds[e + 1])
            sel = np.zeros(A.num_cols, np.bool_)
            sel[e0:e1] = col_sel_other[e0:e1]
            sub = _sub_block_csr(A, r0, r1, rps, sel, col_map, u_pad)
            steps.append(WindowEllPlan.build(sub, split_rows=split_rows,
                                             sup=1024))
        ring_plans.append(steps)

    diag_stacked, diag_aux = _stack_plans(diag_plans, rps, cps)
    flat = [p for steps in ring_plans for p in steps]
    if flat:
        ring_stacked, ring_aux = _stack_plans(flat, rps, u_pad)
        ring_stacked = [a.reshape((n, n - 1) + a.shape[1:])
                        for a in ring_stacked]
    else:  # n == 1: no ring steps
        ring_stacked, ring_aux = [np.zeros((1, 0))] * 8, diag_aux

    def put(a, extra_dims):
        return jax.device_put(
            jnp.asarray(a),
            NamedSharding(mesh, P(axis_name, *([None] * extra_dims))))

    shard_nnz = ptr[bounds[1:]] - ptr[bounds[:-1]]
    return RingShardedCSR(
        diag_leaves=tuple(put(a, a.ndim - 1) for a in diag_stacked),
        diag_aux=diag_aux,
        ring_leaves=tuple(put(a, a.ndim - 1) for a in ring_stacked),
        ring_aux=ring_aux,
        pack_idx=put(pack_idx, 1),
        num_rows=A.num_rows, num_cols=A.num_cols, nnz=A.nnz,
        rows_per_shard=rps, cols_per_shard=cps, u_max=u_pad,
        bounds=tuple(int(b) for b in bounds),
        col_bounds=tuple(int(b) for b in col_bounds),
        shard_nnz=tuple(int(v) for v in shard_nnz),
        pack_len=tuple(len(p) for p in pack_lists))


def ring_traffic_report(rs: RingShardedCSR) -> dict:
    """ICI/DCN byte model per SpMV, per device — the honest comparison
    the virtual mesh cannot time (BASELINE.md 1->4-host target):

    * ``replicate``: all-gather of x before compute — each device
      receives the other shards' blocks ((n-1)/n of x), serialized
      before any flop.
    * ``ring``: n-1 ppermute hops of the PACKED slice (hideable behind
      the per-step kernels when the ICI budget allows — measured in
      ``benchmarks/overlap.py``).
    * ``ideal_pairwise``: lower bound if every (shard, source) pair
      shipped exactly its own footprint (all-to-all).
    """
    n = rs.n_shards
    if n <= 1:
        return {"n_shards": 1, "replicate_bytes": 0, "ring_bytes": 0,
                "ideal_pairwise_bytes": 0, "compression": 1.0,
                "ring_wins": False}
    replicate = (n - 1) * rs.cols_per_shard * 4
    ring = (n - 1) * rs.u_max * 4
    # footprint-mean bound (per-pair byte counts are not tracked in the
    # packed form)
    ideal = (n - 1) * int(np.mean(rs.pack_len)) * 4
    return {
        "n_shards": n,
        "replicate_bytes": int(replicate),
        "ring_bytes": int(ring),
        "ideal_pairwise_bytes": int(ideal),
        "compression": float(replicate / max(ring, 1)),
        "ring_wins": bool(ring < replicate),
    }


@functools.lru_cache(maxsize=32)
def _ring_spmv_fn(mesh: Mesh, axis_name: str, diag_aux: tuple,
                  ring_aux: tuple, n_shards: int, cps: int, u_max: int):
    from ..kernels.window_ell import WindowEllPlan, _spmv_window_ell, \
        _use_interpret

    interp = _use_interpret()
    vma = None if interp else frozenset({axis_name})
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def local(xblk, pidx, diag_leaves, ring_leaves):
        xloc = xblk[0]
        diag = WindowEllPlan.tree_unflatten(
            diag_aux, tuple(a[0] for a in diag_leaves) + (None,))
        y = _spmv_window_ell(diag, xloc[:cps], vma=vma)
        if n_shards == 1:
            return y[None]
        buf = jnp.take(xloc, pidx[0], mode="clip")

        def step(carry, leaves_r):
            y, buf = carry
            buf = jax.lax.ppermute(buf, axis_name, perm)
            plan = WindowEllPlan.tree_unflatten(
                ring_aux, tuple(leaves_r) + (None,))
            y = y + _spmv_window_ell(plan, buf, vma=vma)
            return (y, buf), 0

        ring_local = tuple(a[0] for a in ring_leaves)
        (y, _), _ = jax.lax.scan(step, (y, buf), ring_local)
        return y[None]

    def mapped(xblk, pidx, diag_leaves, ring_leaves):
        return shard_map(
            lambda xb, pi, *ls: local(xb, pi, ls[:8], ls[8:]),
            mesh=mesh,
            in_specs=(P(axis_name, None), P(axis_name, None))
            + tuple(P(axis_name) for _ in range(16)),
            out_specs=P(axis_name),
            check_vma=not interp,
        )(xblk, pidx, *diag_leaves, *ring_leaves)

    return jax.jit(mapped)


def spmv_csr_ring(rs: RingShardedCSR, x, mesh: Mesh | None = None,
                  axis_name: str = "rows") -> jax.Array:
    """``y = A @ x`` with x row-sharded and ring-exchanged (packed
    footprint slices over ``ppermute``); returns the stitched
    ``(num_rows,)`` result."""
    x = jnp.asarray(x, jnp.float32)
    if mesh is None:
        mesh = rs.pack_idx.sharding.mesh
    n = rs.n_shards
    xpad = jnp.pad(x, (0, n * rs.cols_per_shard - x.shape[0]))
    xblk = xpad.reshape(n, rs.cols_per_shard)
    fn = _ring_spmv_fn(mesh, axis_name, rs.diag_aux, rs.ring_aux, n,
                       rs.cols_per_shard, rs.u_max)
    y = fn(xblk, rs.pack_idx, rs.diag_leaves, rs.ring_leaves)
    return _stitch_rows(y.reshape(-1), rs.bounds, rs.rows_per_shard)
