"""Matrix-Market ingestion at benchmark scale (round 5, VERDICT r04 #8).

The .mtx loader (io/matrix_market.py, native streaming parser +
counting-sort COO->CSR) had only unit-scale coverage.  This writes
three structured matrices — the non-iid classes real users load from
SuiteSparse — to real .mtx files, reads them back through the public
loader, runs each through the public auto-configured dispatch on the
TPU, and records structure class -> GB/s.  It is also the natural
end-to-end bed for the round-5 reordering pass: the scrambled classes
are probe-applied; measured, RMAT qualifies too — its recursive
quadrant structure concentrates edges toward low vertex ids, which is
exactly the block-coarse locality the quotient-graph probe models
(29.7 GB/s vs the ~17.5 iid asymptote, docs/MTX_r05.json).

Usage: python benchmarks/mtx_bench.py [--out docs/MTX_r05.json]
(real TPU; ~10-15 min: three plan builds + uploads)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def rmat_csr(gen, scale=18, avg_nnz=16, a=0.57, b=0.19, c=0.19):
    """Recursive-matrix (Graph500-style) edge generator — the standard
    synthetic web/social-graph benchmark class (power-law, self-similar,
    NOT block-local)."""
    from tpu_spmv.csr import CSRMatrix

    n = 1 << scale
    m = n * avg_nnz
    rows = np.zeros(m, np.int64)
    cols = np.zeros(m, np.int64)
    for lvl in range(scale):
        r = gen.random(m)
        bit_r = (r >= a + b).astype(np.int64)
        r2 = gen.random(m)
        pright = np.where(bit_r == 0, b / (a + b), (1 - (a + b + c)) /
                          max(1 - (a + b + c) + c, 1e-9))
        bit_c = (r2 < pright).astype(np.int64)
        rows |= bit_r << lvl
        cols |= bit_c << lvl
    key = np.unique(rows * n + cols)
    rr, cc = key // n, (key % n).astype(np.int32)
    ptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(rr, minlength=n), out=ptr[1:])
    vals = gen.uniform(0.1, 1.0, len(key)).astype(np.float32)
    return CSRMatrix(n, n, vals, cc, ptr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/MTX_r05.json")
    args = ap.parse_args()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp_cache")
    import jax
    import jax.numpy as jnp

    from tpu_spmv import native as _native

    _native.require()
    from tpu_spmv import spmv_auto_config, spmv_csr
    from tpu_spmv.bandwidth import measured_stream_bandwidth
    from tpu_spmv.io.matrix_market import (load_matrix_market,
                                           save_matrix_market)
    from tpu_spmv.utils.testing import (RandomGenerator, clustered_csr,
                                        scrambled_banded_csr, spmv_matches)

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}")
    stream_gbs = measured_stream_bandwidth(dev)
    log(f"measured STREAM: {stream_gbs:.1f} GB/s (physics guard)")
    rng = RandomGenerator(42)
    gen = rng.rng

    cases = (
        ("road-like (scrambled banded)", scrambled_banded_csr(
            rng, 262144, bandwidth=2048, avg_nnz=6.0)),
        ("rmat scale-18", rmat_csr(gen, scale=18, avg_nnz=12)),
        ("planted-community (scrambled)", clustered_csr(
            rng, 262144, n_clusters=32, avg_nnz=14.0)),
    )
    out = {}
    with tempfile.TemporaryDirectory() as d:
        for name, m0 in cases:
            path = os.path.join(d, "m.mtx")
            t0 = time.time()
            save_matrix_market(m0, path)
            t_w = time.time() - t0
            t0 = time.time()
            m = load_matrix_market(path)
            t_r = time.time() - t0
            same = (m.num_rows == m0.num_rows and m.nnz == m0.nnz
                    and np.array_equal(m.col_indices, m0.col_indices)
                    and np.allclose(m.values, m0.values, rtol=1e-6))
            log(f"[{name}] mtx write {t_w:.1f}s read {t_r:.1f}s "
                f"roundtrip={same} nnz={m.nnz}")
            x = rng.vector(m.num_cols)
            cfg = spmv_auto_config(m)
            t0 = time.time()
            # recorded-number discipline (CLAUDE.md): 5 median slope
            # pairs AND a physics guard — the byte-model rate cannot
            # exceed measured STREAM; a device phase flip between the
            # differenced runs can corrupt one slope to an impossible
            # value, so retry the measurement when it does
            bm = m.nnz * 8 + (m.num_rows + 1) * 4 + m.num_cols * 4 \
                + m.num_rows * 4
            for _ in range(3):
                r = spmv_csr(m, jnp.asarray(x), cfg, measure=True,
                             measure_iters=100, measure_samples=5)
                if r.elapsed_ms <= 0 or \
                        bm / (r.elapsed_ms / 1e3) / 1e9 \
                        <= stream_gbs * 1.02:
                    break
            ok = r.error_code == 0 and spmv_matches(
                np.asarray(r.y), m, x, rel_tol=1e-5)
            reordered = any(k[0] == "_reorder" and v is not None
                            for k, v in m._plan_cache.items()
                            if isinstance(k, tuple))
            gbs = bm / (r.elapsed_ms / 1e3) / 1e9 if r.elapsed_ms else 0.0
            log(f"[{name}] {r.elapsed_ms:.3f} ms -> {gbs:.1f} GB/s "
                f"byte-model, correct={ok}, reordered={reordered}, "
                f"plan+measure {time.time()-t0:.0f}s")
            out[name] = {
                "nnz": int(m.nnz), "rows": m.num_rows,
                "mtx_write_s": round(t_w, 1), "mtx_read_s": round(t_r, 1),
                "roundtrip_exact": bool(same),
                "t_ms": round(r.elapsed_ms, 4), "gb_s": round(gbs, 2),
                "correct": bool(ok), "reorder_applied": bool(reordered),
            }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    log(f"-> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
