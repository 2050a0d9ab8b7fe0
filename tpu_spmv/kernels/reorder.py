"""Structure-adaptive symmetric reordering for the wide-sparse class.

The window-ELL packing cell is ``(superblock, window, chunk, lane)``; a
wide matrix packs densely exactly when each superblock's column
footprint concentrates into few 1024-column windows.  Natural web-graph
orderings often carry *latent* locality (crawl order, site-contiguous
ids scrambled by concatenation) that the packer cannot see.  This pass
recovers it:

* **Clustering at 128-block granularity**: build the quotient graph
  whose nodes are 128-element row/column blocks and whose edge weights
  are the inter-block nonzero mass, prune to each node's top-K
  neighbours (hub blocks would otherwise connect everything), and order
  blocks by Reverse Cuthill-McKee — a bandwidth-minimizing order that
  lays connected clusters out contiguously.  The permutation is
  SYMMETRIC (rows and columns move together), so it applies to square
  matrices.
* **A cheap probe decides apply-or-skip**: the candidate relabeling is
  scored with the same sampled packing-cost model the superblock
  selector uses (``window_ell._sampled_sup_costs``) — on iid structure
  the model shows no gain (bucket mass is label-invariant — the
  round-3 Poisson-floor analysis, docs/PERF.md) and the pass skips, so
  iid matrices never pay the permuted-plan risk.
* **The runtime permutation is two tiny Pallas chunk-gathers**: the
  plan is built on the permuted matrix, so ``y = A@x`` becomes
  ``unpermute(spmv(plan, permute(x)))``.  XLA lowers a host-level
  ``take`` at ~0.12 Gelem/s on v5e (docs/PERF.md) — dead; the Pallas
  kernel gathers whole 128-lane chunks via a dynamic aligned (8,128)
  VMEM read + a depth-8 ``take_along_axis`` sublane gather (both
  measured primitives: the main kernel's window read and the round-3
  ``sgather`` probe), an HBM-bandwidth copy for vectors that fit VMEM.

Granularity limit (honest): locality shuffled at ELEMENT granularity is
invisible to a 128-block permutation — element-granular movement needs
a cross-sublane inverse (Beneš-style routing) that does not lower on
v5e, the same wall the round-3 cross-superblock row-permutation
campaign hit (docs/PERF.md).  Real scrambles (concatenated crawls,
re-stacked shards) are block-coarse; iid element shuffles have no
locality to recover anyway (label-invariant Poisson floor).

Reference analog: the texture-cached x read exists to exploit x-access
locality (``/root/reference/src/spmv_kernels.cu:7-12``); the
skew-efficiency target is ``requirements.md:68``.
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

from ..csr import CSRMatrix
from .window_ell import (
    LANE, SUP_LEVELS, BandedPlan, WindowEllOverflow, WindowEllPlan,
    _sampled_sup_costs, _use_interpret, build_auto, spmv_banded,
    spmv_window_ell)

BLOCK = LANE            # permutation granularity: one 128-lane chunk
# Top-K quotient-graph pruning: hub blocks touch nearly every other
# block; keeping each node's K heaviest neighbours preserves cluster
# structure while keeping RCM's frontier local.
TOPK = 16
# Modeled-cost win required to apply (permuted plans pay two ~O(vector)
# Pallas gathers per call plus a slightly costlier build; the threshold
# also absorbs model noise so iid matrices never flip on a fluke).
GAIN_THRESHOLD = 0.85
# x must fit one VMEM block in the permute kernel (chunks * 512 B);
# wider matrices go to the column-strip path anyway (spmv.py).
MAX_COLS = 1 << 21


def _enabled() -> bool:
    return os.environ.get("TPU_SPMV_REORDER", "1") not in ("0", "")


def _coords(csr: CSRMatrix) -> tuple[np.ndarray, np.ndarray]:
    rows_of = np.repeat(np.arange(csr.num_rows, dtype=np.int64),
                        np.diff(csr.row_ptrs).astype(np.int64))
    return rows_of, csr.col_indices.astype(np.int64)


def _rcm(indptr: np.ndarray, indices: np.ndarray, n: int) -> np.ndarray:
    """Reverse Cuthill-McKee on a symmetric adjacency (CSR arrays).

    scipy's implementation when available (it is in this image); a
    plain numpy BFS-with-degree-order fallback otherwise — the quotient
    graph is tiny (num_blocks = rows/128), so either is instant.
    """
    try:
        from scipy.sparse import csr_matrix as _sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        g = _sp((np.ones(len(indices), np.int8), indices, indptr),
                shape=(n, n))
        return np.asarray(reverse_cuthill_mckee(g, symmetric_mode=True),
                          dtype=np.int64)
    except ImportError:  # pragma: no cover - scipy is in the image
        deg = np.diff(indptr)
        order, seen = [], np.zeros(n, bool)
        for start in np.argsort(deg, kind="stable"):
            if seen[start]:
                continue
            seen[start] = True
            queue = [int(start)]
            while queue:
                u = queue.pop(0)
                order.append(u)
                nbr = indices[indptr[u]:indptr[u + 1]]
                nbr = nbr[~seen[nbr]]
                seen[nbr] = True
                queue.extend(nbr[np.argsort(deg[nbr], kind="stable")])
        return np.asarray(order[::-1], dtype=np.int64)


def block_order(csr: CSRMatrix, topk: int = TOPK) -> np.ndarray:
    """RCM order of 128-blocks from the pruned symmetric quotient graph.

    Returns ``order`` with ``order[j]`` = the original block occupying
    NEW position ``j``.  Square matrices only (symmetric permutation).
    """
    if csr.num_rows != csr.num_cols:
        raise ValueError("block_order: symmetric reordering needs a "
                         "square matrix")
    nb = -(-max(csr.num_rows, 1) // BLOCK)
    rows_of, cols64 = _coords(csr)
    rb, cb = rows_of // BLOCK, cols64 // BLOCK
    key = rb * nb + cb
    uk, w = np.unique(key, return_counts=True)
    i, j = uk // nb, uk % nb
    # symmetrize weights, drop self-loops
    ii = np.concatenate([i, j])
    jj = np.concatenate([j, i])
    ww = np.concatenate([w, w])
    off = ii != jj
    ii, jj, ww = ii[off], jj[off], ww[off]
    if len(ii) == 0:
        return np.arange(nb, dtype=np.int64)
    sk = ii * nb + jj
    us, inv = np.unique(sk, return_inverse=True)
    wsum = np.zeros(len(us), np.int64)
    np.add.at(wsum, inv, ww)
    ii, jj = us // nb, us % nb
    # two-stage pruning: (1) drop edges much lighter than their source
    # node's heaviest edge — iid noise edges carry 1-3 nonzeros while
    # genuine cluster edges carry hundreds, and RCM's BFS frontier
    # interleaves clusters through any kept noise edge; (2) cap the
    # surviving degree at top-K by weight (hub blocks)
    o = np.lexsort((-wsum, ii))
    ii, jj, wsum = ii[o], jj[o], wsum[o]
    starts = np.searchsorted(ii, np.arange(nb))
    wmax = np.zeros(nb, np.int64)
    has = starts < len(ii)
    wmax[has] = wsum[np.minimum(starts, len(ii) - 1)][has]
    rank = np.arange(len(ii)) - starts[ii]
    keep = (rank < topk) & (wsum * 8 >= wmax[ii])
    ii, jj = ii[keep], jj[keep]
    # re-symmetrize the pruned edge set (RCM wants symmetric structure)
    sk = np.unique(np.concatenate([ii * nb + jj, jj * nb + ii]))
    ii, jj = sk // nb, sk % nb
    indptr = np.zeros(nb + 1, np.int64)
    np.cumsum(np.bincount(ii, minlength=nb), out=indptr[1:])
    return _rcm(indptr, jj.astype(np.int64), nb)


def _relabel(coord: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """New element labels under a block permutation (``pos[b]`` = new
    position of original block ``b``; within-block offsets keep)."""
    return pos[coord // BLOCK] * BLOCK + coord % BLOCK


def reorder_gain(csr: CSRMatrix, order: np.ndarray) -> tuple[float, float]:
    """(natural_cost, permuted_cost) under the sampled packing model.

    Costs are the model's comparable units (groups x per-slot rate);
    ``inf`` when every superblock level is disqualified on that side.
    """
    rows_of, cols64 = _coords(csr)
    nb = len(order)
    pos = np.empty(nb, np.int64)
    pos[order] = np.arange(nb)
    n_pad = nb * BLOCK

    def best(r, c, nr, nc):
        costs = _sampled_sup_costs(r, c, nr, nc)
        return min((c0 for c0, _ in costs.values()), default=float("inf"))

    nat = best(rows_of, cols64, csr.num_rows, csr.num_cols)
    prm = best(_relabel(rows_of, pos), _relabel(cols64, pos), n_pad, n_pad)
    return nat, prm


def permute_csr(csr: CSRMatrix, order: np.ndarray) -> CSRMatrix:
    """The symmetrically block-permuted matrix (dims padded to the block
    grid — positions past the original dims are empty rows / never-hit
    columns, trimmed again by the ``ReorderedPlan`` wrapper)."""
    nb = len(order)
    pos = np.empty(nb, np.int64)
    pos[order] = np.arange(nb)
    n_pad = nb * BLOCK
    rows_of, cols64 = _coords(csr)
    new_r = _relabel(rows_of, pos)
    new_c = _relabel(cols64, pos)
    o = np.argsort(new_r * n_pad + new_c, kind="stable")
    new_r, new_c = new_r[o], new_c[o]
    ptr = np.zeros(n_pad + 1, np.int64)
    np.cumsum(np.bincount(new_r, minlength=n_pad), out=ptr[1:])
    return CSRMatrix(n_pad, n_pad, np.asarray(csr.values)[o],
                     new_c.astype(np.int32), ptr.astype(np.int64))


# ---------------------------------------------------------------------------
# The Pallas chunk-gather: out chunk j = x chunk src[j].

_TO = 64      # output sublanes (chunks) per grid step


@functools.lru_cache(maxsize=32)
def _build_permute(n_src8: int, n_out: int, interpret: bool):
    """``out[j, :] = x[src[j], :]`` over (chunks, 128) views.

    x lives whole in one VMEM block (constant index map); each output
    chunk does one dynamic 8-aligned (8,128) VMEM read (the main
    kernel's window-table idiom) and one depth-8 sublane gather (the
    measured ``sgather`` primitive, docs/PERF.md round-3 table) — pure
    VMEM traffic, so the pass runs at the HBM copy floor.
    """

    def kernel(src_ref, x_ref, o_ref):
        i = pl.program_id(0)
        for s in range(_TO):
            src = src_ref[i * _TO + s]
            tile = x_ref[pl.ds(pl.multiple_of((src // 8) * 8, 8), 8), :]
            g = jnp.take_along_axis(
                tile, jnp.full((8, LANE), src % 8, jnp.int32), axis=0)
            o_ref[s:s + 1, :] = g[:1, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_out // _TO,),
        in_specs=[pl.BlockSpec((n_src8, LANE), lambda i, src: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_TO, LANE), lambda i, src: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, LANE), jnp.float32),
        interpret=interpret,
    )


def permute_chunks(x: jax.Array, src: jax.Array, out_len: int) -> jax.Array:
    """Gather 128-element chunks: ``out.reshape(-1,128)[j] =
    pad(x).reshape(-1,128)[src[j]]``, trimmed to ``out_len``."""
    x = jnp.asarray(x, jnp.float32)
    n_src = -(-x.shape[0] // LANE)
    n_src8 = -(-n_src // 8) * 8
    x2d = jnp.pad(x, (0, n_src8 * LANE - x.shape[0])).reshape(n_src8, LANE)
    n_out = src.shape[0]
    n_out_pad = -(-n_out // _TO) * _TO
    src_pad = jnp.pad(src.astype(jnp.int32), (0, n_out_pad - n_out))
    out = _build_permute(n_src8, n_out_pad, _use_interpret())(src_pad, x2d)
    return out.reshape(-1)[:out_len]


# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ReorderedPlan:
    """A packed plan built on the block-permuted matrix, plus the two
    chunk-gather maps that make it serve the ORIGINAL operand order:
    ``y = unpermute(inner(permute(x)))``."""

    inner: object            # WindowEllPlan | BandedPlan (permuted space)
    col_src: jax.Array       # i32 (nb,) x-permute gather: new chunk j
    #                          reads original chunk col_src[j] (= order)
    row_src: jax.Array       # i32 (nb,) y-unpermute gather: natural
    #                          chunk b reads permuted chunk row_src[b]
    num_rows: int            # original (unpadded) dims
    num_cols: int

    def tree_flatten(self):
        return ((self.inner, self.col_src, self.row_src),
                (self.num_rows, self.num_cols))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @property
    def occupancy(self) -> float:
        return self.inner.occupancy

    @property
    def n_groups(self) -> int:
        return self.inner.n_groups

    def save(self, path: str) -> None:
        from ..plan_io import save_plan

        save_plan(self, path)

    @staticmethod
    def load(path: str, device=None) -> "ReorderedPlan":
        from ..plan_io import load_plan

        return load_plan(path, device=device)


@jax.jit
def spmv_reordered(rp: ReorderedPlan, x: jax.Array) -> jax.Array:
    """``y = A @ x`` through a reordered plan: permute x into the plan's
    block order, run the inner packed kernel, gather y back."""
    inner = rp.inner
    xp = permute_chunks(x, rp.col_src, inner.num_cols)
    fn = spmv_banded if isinstance(inner, BandedPlan) else spmv_window_ell
    yp = fn(inner, xp)
    return permute_chunks(yp, rp.row_src, rp.num_rows)


def build_reordered(csr: CSRMatrix, order: np.ndarray | None = None,
                    split_rows: int | None = None,
                    step_groups: int | None = None,
                    device=None, permute_rows: bool | None = None,
                    values_dtype=np.float32) -> tuple:
    """Build a :class:`ReorderedPlan` under the given (or RCM) block
    order.  Returns ``(spmv_reordered, plan)`` — the same contract as
    :func:`window_ell.build_auto`.  Raises :class:`WindowEllOverflow`
    when the permuted matrix rejects every packed layout."""
    if order is None:
        order = block_order(csr)
    perm_csr = permute_csr(csr, order)
    fn, inner = build_auto(perm_csr, split_rows=split_rows,
                           step_groups=step_groups, device=device,
                           permute_rows=permute_rows,
                           values_dtype=values_dtype)
    nb = len(order)
    pos = np.empty(nb, np.int64)
    pos[order] = np.arange(nb)
    col_src = jnp.asarray(order, jnp.int32)
    row_src = jnp.asarray(pos, jnp.int32)
    if device is not None:
        col_src = jax.device_put(col_src, device)
        row_src = jax.device_put(row_src, device)
    rp = ReorderedPlan(inner=inner, col_src=col_src, row_src=row_src,
                       num_rows=csr.num_rows, num_cols=csr.num_cols)
    return spmv_reordered, rp


def maybe_reorder(csr: CSRMatrix, choice: tuple | None = None,
                  force: bool = False,
                  split_rows: int | None = None) -> np.ndarray | None:
    """The dispatch probe: an RCM block order when the structure says
    the permutation pays, else ``None``.

    Gates (each one cheap-first): the knob/env is on; the matrix is
    square, non-trivial, and VMEM-permutable; the superblock model's
    pick is a WIDE level (the narrow class is already stream-bound at
    ~0.89x STREAM — docs/PERF.md — and has nothing to gain); and the
    sampled packing model scores the candidate order at
    <= ``GAIN_THRESHOLD`` of natural cost.  iid structure fails the
    last gate (bucket mass is label-invariant), so it never pays the
    permuted build.  ``force=True`` (``SpMVConfig.reorder=True``)
    bypasses the wide-class and gain gates for A/Bs — the structural
    gates (square, size caps) still apply.
    """
    if not _enabled():
        return None
    if csr.num_rows != csr.num_cols or csr.num_cols > MAX_COLS:
        return None
    if csr.nnz < (1 << 16) or csr.num_rows < 4 * SUP_LEVELS[0]:
        return None
    if force:
        return block_order(csr)
    from .window_ell import _choose_sup

    sup = (choice[0] if choice is not None
           else _choose_sup(csr, split_rows=split_rows))
    if sup <= SUP_LEVELS[0]:
        return None
    order = block_order(csr)
    nat, prm = reorder_gain(csr, order)
    # prm must be FINITE: (inf, inf) means no superblock level packs on
    # either side — "inf <= 0.85*inf" would vacuously apply an order
    # whose permuted build is guaranteed to overflow anyway
    if np.isfinite(prm) and prm <= GAIN_THRESHOLD * nat:
        return order
    return None
