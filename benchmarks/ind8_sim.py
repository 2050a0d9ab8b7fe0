"""Simulate ind8 'virtual superblock' packing vs the fixed-sup design.

The proto_v3 ``ind8u`` kernel (8 single-sublane RMWs at ARBITRARY
scalar-prefetched targets, +0.55 ps/slot over base on v5e) would let a
run scatter to any 8 output tiles — dissolving the fixed contiguous
superblock geometry, so the planner could form tilesets freely (and
avoid the per-sup x8 run rounding) with NO inverse-permutation pass.

Both sims here run on the same per-(tile, w, r, l) depth tensor derived
from the LEVELED headline matrix (lane leveling applied, no row
splitting, shared depth-cap spill rule), so the ratio isolates the
tileset-formation freedom that ind8's arbitrary 8-target runs buy.

MEASURED NEGATIVE (2026-08-18, recorded in docs/PERF.md backlog): the
greedy former lands at ratio ~1.10 — WORSE than contiguous sups.  With
iid rows and per-tile lane leveling every tile's profile is
statistically identical, so tileset choice buys only noise (the same
conclusion as the cross-tile permute probes); the x8-rounding recovery
(~4%) cannot pay the +6% slot cost.  Kept as the evidence artifact.
"""
import sys, time
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, ".")
from tpu_spmv.kernels.window_ell import _level_rows, LANE, CHUNKS, WINDOW
from tpu_spmv.utils.testing import RandomGenerator

CAP = 12          # spill depth cap per cell (both sims)
TB = 8            # groups per run / targets per run

rng = RandomGenerator(42)
csr = rng.power_law_csr(262144, 4096, avg_nnz=40.0, alpha=1.6)
lam, csr = _level_rows(csr, 1024, 128)
rows, nnz = csr.num_rows, csr.nnz
n_tiles = rows // LANE
row_of = np.repeat(np.arange(rows, dtype=np.int64), np.diff(csr.row_ptrs))
tile = row_of // LANE
lane = row_of % LANE
col = csr.col_indices.astype(np.int64)
w = col // WINDOW
r = (col % WINDOW) // LANE
n_w = int(w.max()) + 1
print(f"nnz={nnz} tiles={n_tiles} windows={n_w}")

# depth tensor d[t, w, r, l] as sparse counts
key = ((tile * n_w + w) * CHUNKS + r) * LANE + lane
uk, dep = np.unique(key, return_counts=True)
# spill rule: depth above CAP spills to extras (same in both sims)
spill = np.maximum(dep - CAP, 0)
dep = np.minimum(dep, CAP)
print(f"spilled nnz (both sims): {int(spill.sum())}")

ut = uk // (n_w * CHUNKS * LANE)
uw = (uk // (CHUNKS * LANE)) % n_w
url = uk % (CHUNKS * LANE)

# ---- fixed-sup sim (8 consecutive tiles per sup) ----
sup = ut // TB
skey = (sup * n_w + uw) * (CHUNKS * LANE) + url
us, sinv = np.unique(skey, return_inverse=True)
pooled = np.zeros(len(us), np.int64)
np.add.at(pooled, sinv, dep)
bkey = us // (CHUNKS * LANE)          # (sup, w)
ub, binv = np.unique(bkey, return_inverse=True)
lmax = np.zeros(len(ub), np.int64)
np.maximum.at(lmax, binv, pooled)
sup_of_b = ub // n_w
usup, supinv = np.unique(sup_of_b, return_inverse=True)
lsum = np.zeros(len(usup), np.int64)
np.add.at(lsum, supinv, lmax)
fixed_groups = int((-(-lsum // TB) * TB).sum())
print(f"fixed-sup sim: layers={int(lmax.sum())} groups(x8)={fixed_groups}")

# ---- ind8 sim: greedy tileset formation with depth splitting ----
# per-(tile, w): profile over 1024 cells. Greedy: repeatedly start a
# tileset from the heaviest remaining tile, add tiles while the marginal
# fill improves, allocate layers per window = max pooled cell depth,
# round the run total up to x8 by adding more layers/windows from the
# same set (absorb), else pad.
t0 = time.time()
prof = {}
tw_nnz = np.zeros((n_tiles, n_w), np.int64)
order = np.argsort(((ut * n_w + uw)))
# build per-(t,w) dense profiles lazily from sorted slices
utw, tw_start = np.unique((ut * n_w + uw)[order], return_index=True)
tw_end = np.append(tw_start[1:], len(order))
idx_of_tw = {int(k): (int(a), int(b))
             for k, a, b in zip(utw, tw_start, tw_end)}
np.add.at(tw_nnz, (ut, uw), dep)

def profile(t, wv):
    k = t * n_w + wv
    ab = idx_of_tw.get(int(k))
    p = np.zeros(CHUNKS * LANE, np.int64)
    if ab:
        sl = order[ab[0]:ab[1]]
        p[url[sl]] = dep[sl]
    return p

remaining = tw_nnz.sum(axis=1).copy()
active = set(np.nonzero(remaining)[0].tolist())
total_groups = 0
total_layers = 0
sets = 0
while active:
    # seed: heaviest remaining tile
    seed = max(active, key=lambda t: remaining[t])
    cur = [seed]
    pooled_w = [profile(seed, wv) for wv in range(n_w)]
    # grow to 8 tiles: pick tiles maximizing added nnz per added layer
    cand_pool = sorted(active - {seed},
                       key=lambda t: -remaining[t])[:64]
    while len(cur) < TB and cand_pool:
        best, best_gain = None, -1e18
        cur_layers = sum(int(p.max()) for p in pooled_w)
        for t in cand_pool[:24]:
            lay = 0
            add = 0
            for wv in range(n_w):
                if tw_nnz[t, wv] == 0:
                    continue
                q = pooled_w[wv] + profile(t, wv)
                lay += int(q.max())
                add += int(tw_nnz[t, wv])
            for wv in range(n_w):
                if tw_nnz[t, wv] == 0:
                    lay += int(pooled_w[wv].max())
            dl = lay - cur_layers
            gain = add - dl * 1024    # nnz beyond the layer cost
            if gain > best_gain:
                best_gain, best = gain, t
        if best is None:
            break
        cur.append(best)
        cand_pool.remove(best)
        for wv in range(n_w):
            pooled_w[wv] += profile(best, wv)
    layers_w = [int(p.max()) for p in pooled_w]
    tot = sum(layers_w)
    # round up to x8: honest padding
    groups = -(-tot // TB) * TB
    total_groups += groups
    total_layers += tot
    sets += 1
    for t in cur:
        active.discard(t)
        remaining[t] = 0

print(f"ind8 sim: sets={sets} layers={total_layers} "
      f"groups={total_groups} [{time.time()-t0:.0f}s]")
print(f"ratio ind8/fixed = {total_groups/fixed_groups:.3f}")
