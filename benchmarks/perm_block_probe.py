"""Block-constrained row-permutation probes (CPU slot accounting).

Evaluates how much group count a PRODUCTIZABLE row permutation could
save on the wide (web-graph) class beyond the shipped within-tile
lane leveling.  "Productizable" = blocks of 1024 original rows move
across superblocks inside a W-sup window while rows keep their natural
128-row tile and only lanes level per tile (``block_balance_coarse``)
— the output inverse is then the EXISTING per-tile lane gather plus a
dynamic 8-sublane block read, both device-proven primitives.  The
``block_balance_perm`` variant additionally frees rows across the
block's 8 tiles (needs one more depth-8 sublane gather).

MEASURED NEGATIVE (2026-08-18, outage window; 262K web graph,
nnz=3.66M, vs the shipped native leveler):

    shipped leveled (permute_rows=True)  sup=4096: 30208   sup=16384: 13056
    coarse tile-distinct W=2             sup=4096: 32384   sup=16384: 13312
    coarse tile-distinct W=4             sup=4096: 32128   sup=16384: 13184

Cross-sup movement at block granularity LOSES to the shipped per-tile
leveling: with iid rows any 1024-block is statistically identical, so
block placement freedom is noise (the ind8_sim conclusion at a coarser
granularity), and the probe's simpler greedy gives back more than the
freedom wins.  The earlier "element-free W=4, -11% further" ceiling
(docs/PERF.md) survives only with ELEMENT-level cross-sup movement,
whose inverse needs per-lane Benes-style sublane routing — unproven
under Mosaic and priced well above the win on a scatter-bound class.
The wide-class permutation campaign is closed; docs/PERF.md backlog
carries the conclusion.
"""
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

sys.path.insert(0, ".")
from tpu_spmv.csr import CSRMatrix  # noqa: E402
from tpu_spmv.kernels.window_ell import (  # noqa: E402
    CHUNKS, LANE, WINDOW, WindowEllPlan, _bucket)
from tpu_spmv.native import balance_extra_slots  # noqa: E402
from tpu_spmv.utils.testing import RandomGenerator, web_graph_csr  # noqa: E402

BLK = 1024


def permute_rows(csr, perm):
    row_len = np.diff(csr.row_ptrs).astype(np.int64)
    new_len = row_len[perm]
    new_ptr = np.zeros(csr.num_rows + 1, dtype=csr.row_ptrs.dtype)
    np.cumsum(new_len, out=new_ptr[1:])
    src = np.repeat(csr.row_ptrs[perm].astype(np.int64), new_len) \
        + (np.arange(csr.nnz, dtype=np.int64)
           - np.repeat(new_ptr[:-1].astype(np.int64), new_len))
    return CSRMatrix(num_rows=csr.num_rows, num_cols=csr.num_cols,
                     values=np.asarray(csr.values)[src],
                     col_indices=np.asarray(csr.col_indices)[src],
                     row_ptrs=new_ptr)


def balance_perm(csr, sup, W=2):
    """Element-free ceiling: every row is a free (sup, lane) slot unit
    (the extras balancer applied to whole rows) — NOT productizable,
    the inverse would need element-level cross-sublane routing."""
    cols64 = np.asarray(csr.col_indices, np.int64)
    wc = (cols64 // WINDOW) * CHUNKS + (cols64 // LANE) % CHUNKS
    n_wc = (_bucket(csr.num_cols) // WINDOW) * CHUNKS
    idx = balance_extra_slots(np.asarray(csr.row_ptrs, np.int64), wc,
                              n_wc, sup_rows=sup, window_sups=W,
                              ext_crow=None, layer_aware=2)
    return np.argsort(idx)


def build_count(csr, sup, label):
    t0 = time.time()
    p = WindowEllPlan.build(csr, split_rows=128, step_groups=128, sup=sup)
    print(f"{label:34s} sup={sup:6d} groups={p.n_groups:6d} "
          f"occ={p.occupancy:.4f} [{time.time()-t0:.0f}s]", flush=True)
    return p.n_groups


def block_balance_perm(csr, sup, W=2, rng=None):
    """Greedy: blocks (1024 original rows) -> (sup, block slot); rows ->
    lanes with cap 8/block/lane; raise-count primary, d^2 tiebreak."""
    n = csr.num_rows
    n_pad = -(-n // BLK) * BLK
    n_blocks = n_pad // BLK
    blocks_per_sup = sup // BLK
    n_sups = -(-n_blocks // blocks_per_sup)
    cols64 = np.asarray(csr.col_indices, np.int64)
    wc_all = (cols64 // WINDOW) * CHUNKS + (cols64 // LANE) % CHUNKS
    n_wc = (_bucket(csr.num_cols) // WINDOW) * CHUNKS
    ptr = np.asarray(csr.row_ptrs, np.int64)
    row_len = np.diff(ptr)

    # RLE per row: (cells, counts) lists
    order_in_row = np.lexsort(
        (wc_all, np.repeat(np.arange(n, dtype=np.int64), row_len)))
    wc_s = wc_all[order_in_row]

    D = np.zeros((n_sups, n_wc, 128), np.int32)    # cell depths
    BM = np.zeros((n_sups, n_wc // CHUNKS), np.int32)  # bucket maxes
    out_pos = np.empty(n, np.int64)
    slot_next = np.zeros(n_sups, np.int64)         # next block slot in sup

    # process blocks in windows of W sups' worth of slots
    t0 = time.time()
    blk_order = np.arange(n_blocks)
    for wstart in range(0, n_blocks, W * blocks_per_sup):
        wend = min(n_blocks, wstart + W * blocks_per_sup)
        sup0 = wstart // blocks_per_sup
        sups = [s for s in range(sup0, min(sup0 + W, n_sups))]
        cap_blk = {s: min((s + 1) * blocks_per_sup, n_blocks)
                   - max(s * blocks_per_sup, wstart) for s in sups}
        # heaviest blocks first
        wblocks = blk_order[wstart:wend]
        weights = [int(row_len[b * BLK:min((b + 1) * BLK, n)].sum())
                   for b in wblocks]
        for b in [wblocks[i] for i in np.argsort(weights)[::-1]]:
            rows = np.arange(b * BLK, min((b + 1) * BLK, n))
            rl = row_len[rows]
            row_order = rows[np.argsort(rl)[::-1]]
            # evaluate each candidate sup by simulated greedy lane fill
            best = None
            for s in sups:
                if cap_blk[s] <= 0:
                    continue
                Ds = D[s]
                BMs = BM[s]
                dd = Ds.copy()
                bm = BMs.copy()
                lane_fill = np.zeros(128, np.int32)
                tot_raises = 0
                tot_sc = 0
                assign = np.empty(len(row_order), np.int32)
                for i, r in enumerate(row_order):
                    a, z = ptr[r], ptr[r + 1]
                    cells, k = np.unique(wc_s[a:z], return_counts=True)
                    if len(cells) == 0:
                        assign[i] = int(np.argmin(lane_fill))
                        lane_fill[assign[i]] += 1
                        continue
                    dsub = dd[cells]                      # (m, 128)
                    nd = dsub + k[:, None].astype(np.int32)
                    over = np.maximum(
                        nd - bm[cells // CHUNKS][:, None], 0)
                    raises = over.sum(axis=0)
                    sc = (nd.astype(np.int64) ** 2
                          - dsub.astype(np.int64) ** 2).sum(axis=0)
                    full = lane_fill >= max(BLK // 128, 1)
                    cost = raises.astype(np.int64) * (1 << 40) + sc
                    cost[full] = np.int64(1) << 62
                    l = int(np.argmin(cost))
                    assign[i] = l
                    tot_raises += int(raises[l])
                    tot_sc += int(sc[l])
                    dd[cells, l] = nd[:, l]
                    np.maximum.at(bm, cells // CHUNKS, nd[:, l])
                    lane_fill[l] += 1
                key = (tot_raises, tot_sc)
                if best is None or key < best[0]:
                    best = (key, s, assign, dd, bm)
            _, s, assign, dd, bm = best
            D[s] = dd
            BM[s] = bm
            slot = slot_next[s]
            slot_next[s] += 1
            cap_blk[s] -= 1
            # rows -> positions: sup base + block slot base + sub*128+lane
            sub_of_lane = np.zeros(128, np.int32)
            base = s * sup + slot * BLK
            for i, r in enumerate(row_order):
                l = assign[i]
                out_pos[r] = base + sub_of_lane[l] * 128 + l
                sub_of_lane[l] += 1
    print(f"  block-balance: {time.time()-t0:.0f}s", flush=True)
    # fill padded tail positions: none (n may < n_pad; positions are
    # only for real rows, perm below is over real rows)
    return np.argsort(out_pos)


def main():
    """The 2026-08-18 decision run: shipped leveled baselines vs the
    productizable coarse tile-distinct movers (numbers in the module
    docstring)."""
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    rng = RandomGenerator(42)
    csr = web_graph_csr(rng, n, n, avg_nnz=14.5)
    print(f"web graph n={n} nnz={csr.nnz}", flush=True)
    for sup in (4096, 16384):
        t0 = time.time()
        p = WindowEllPlan.build(csr, split_rows=128, step_groups=128,
                                sup=sup, permute_rows=True)
        print(f"{'shipped leveled':34s} sup={sup:6d} "
              f"groups={p.n_groups:6d} occ={p.occupancy:.4f} "
              f"[{time.time()-t0:.0f}s]", flush=True)
    for sup in (4096, 16384):
        for W in (2, 4):
            perm = block_balance_coarse(csr, sup, W=W)
            build_count(permute_rows(csr, perm), sup,
                        f"coarse tile-distinct W={W}")


def main_full():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    rng = RandomGenerator(42)
    csr = web_graph_csr(rng, n, n, avg_nnz=14.5)
    print(f"web graph n={n} nnz={csr.nnz}", flush=True)
    for sup in (4096, 16384):
        build_count(csr, sup, "natural")
        perm = block_balance_perm(csr, sup, W=2)
        build_count(permute_rows(csr, perm), sup, "block-constrained W=2")
        perm = balance_perm(csr, sup, 4)
        build_count(permute_rows(csr, perm), sup, "element-free W=4")




def block_balance_coarse(csr, sup, W=2):
    """Variant: sup chosen by a coarse leveled-layer estimate (no per-sup
    simulation), then one exact sequential greedy commit; rows within a
    TILE take distinct lanes (the productizable constraint)."""
    n = csr.num_rows
    n_blocks = -(-n // BLK)
    blocks_per_sup = sup // BLK
    n_sups = -(-n_blocks // blocks_per_sup)
    cols64 = np.asarray(csr.col_indices, np.int64)
    wc_all = (cols64 // WINDOW) * CHUNKS + (cols64 // LANE) % CHUNKS
    n_wc = (_bucket(csr.num_cols) // WINDOW) * CHUNKS
    ptr = np.asarray(csr.row_ptrs, np.int64)
    row_len = np.diff(ptr)
    order_in_row = np.lexsort(
        (wc_all, np.repeat(np.arange(n, dtype=np.int64), row_len)))
    wc_s = wc_all[order_in_row]

    D = np.zeros((n_sups, n_wc, 128), np.int32)
    BM = np.zeros((n_sups, n_wc // CHUNKS), np.int32)
    DS = np.zeros((n_sups, n_wc), np.int64)       # depth sums per cell col
    out_pos = np.empty(n, np.int64)
    slot_next = np.zeros(n_sups, np.int64)
    t0 = time.time()
    for wstart in range(0, n_blocks, W * blocks_per_sup):
        wend = min(n_blocks, wstart + W * blocks_per_sup)
        sup0 = wstart // blocks_per_sup
        sups = list(range(sup0, min(sup0 + W, n_sups)))
        cap_blk = {s: min((s + 1) * blocks_per_sup, n_blocks)
                   - max(s * blocks_per_sup, wstart) for s in sups}
        wblocks = np.arange(wstart, wend)
        weights = [int(row_len[b * BLK:min((b + 1) * BLK, n)].sum())
                   for b in wblocks]
        for b in [wblocks[i] for i in np.argsort(weights)[::-1]]:
            rows = np.arange(b * BLK, min((b + 1) * BLK, n))
            a0, z0 = ptr[rows[0]], ptr[rows[-1] + 1]
            H = np.bincount(wc_s[a0:z0], minlength=n_wc)
            # coarse: increase in sum-of-leveled-layers per window
            best_s, best_sc = None, None
            for s in sups:
                if cap_blk[s] <= 0:
                    continue
                cur = -(-DS[s] // 128).reshape(-1, CHUNKS).max(axis=1)
                new = (-(-(DS[s] + H) // 128)).reshape(
                    -1, CHUNKS).max(axis=1)
                sc = int((new - cur).sum())
                if best_sc is None or sc < best_sc:
                    best_sc, best_s = sc, s
            s = best_s
            dd, bm = D[s], BM[s]
            for t0r in range(0, len(rows), 128):
                tile = rows[t0r:t0r + 128]
                lane_used = np.zeros(128, bool)
                for r in tile[np.argsort(row_len[tile])[::-1]]:
                    a, z = ptr[r], ptr[r + 1]
                    cells, k = np.unique(wc_s[a:z], return_counts=True)
                    if len(cells) == 0:
                        l = int(np.argmin(lane_used))
                        lane_used[l] = True
                        out_pos[r] = (s * sup + slot_next[s] * BLK
                                      + (r - rows[0]) // 128 * 128 + l)
                        continue
                    dsub = dd[cells]
                    nd = dsub + k[:, None].astype(np.int32)
                    over = np.maximum(nd - bm[cells // CHUNKS][:, None], 0)
                    cost = (over.sum(axis=0).astype(np.int64) * (1 << 40)
                            + (nd.astype(np.int64) ** 2
                               - dsub.astype(np.int64) ** 2).sum(axis=0))
                    cost[lane_used] = np.int64(1) << 62
                    l = int(np.argmin(cost))
                    lane_used[l] = True
                    dd[cells, l] = nd[:, l]
                    np.maximum.at(bm, cells // CHUNKS, nd[:, l])
                    DS[s][cells] += k
                    out_pos[r] = (s * sup + slot_next[s] * BLK
                                  + (r - rows[0]) // 128 * 128 + l)
            slot_next[s] += 1
            cap_blk[s] -= 1
    print(f"  coarse block-balance: {time.time()-t0:.0f}s", flush=True)
    return np.argsort(out_pos)


def main_coarse():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    rng = RandomGenerator(42)
    csr = web_graph_csr(rng, n, n, avg_nnz=14.5)
    print(f"web graph n={n} nnz={csr.nnz}", flush=True)
    for sup in (4096, 16384):
        for W in (2, 4):
            perm = block_balance_coarse(csr, sup, W=W)
            build_count(permute_rows(csr, perm), sup,
                        f"coarse tile-distinct W={W}")




def main_w1():
    from tpu_spmv.utils.testing import RandomGenerator
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    rng = RandomGenerator(42)
    csr = web_graph_csr(rng, n, n, avg_nnz=14.5)
    print(f"web graph n={n} nnz={csr.nnz}", flush=True)
    for sup in (4096, 16384):
        perm = block_balance_coarse(csr, sup, W=1)
        build_count(permute_rows(csr, perm), sup, "coarse tile W=1 (in-sup)")
    rng = RandomGenerator(42)
    h = rng.power_law_csr(262144, 4096, avg_nnz=40.0, alpha=1.6)
    print(f"headline nnz={h.nnz}", flush=True)
    for W in (1, 2):
        perm = block_balance_coarse(h, 1024, W=W)
        build_count(permute_rows(h, perm), 1024, f"headline coarse W={W}")

if __name__ == "__main__":
    main()
