"""Probe XLA gather / segment-sum throughput on TPU (round 3).

Decides whether a "pre-gathered sliced-ELL" wide-sparse path is viable:
  y = slice_reduce(v * x[cols])  with x[cols] produced by an XLA take.

Measures, for a web-graph-scale workload (14.5M nnz):
  take_small — jnp.take into a 16 KB table (headline regime)
  take_big   — jnp.take into a 4 MB table (1M-col web graph regime)
  seg_sum    — jax.ops.segment_sum over sorted 1M segments
  slice_red  — the sliced-ELL reduction shape: (n/128, 128) f32 stream
               summed along axis 0 in row-major slices (XLA, no Pallas)

Usage: python benchmarks/proto_gather.py [nnz_millions]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from tpu_spmv.timing import time_jitted  # noqa: E402


def main():
    n = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 14_500_000
    n = (n // 1024) * 1024
    rng = np.random.default_rng(0)

    for name, tbl in [("take_small", 4096), ("take_big", 1 << 20)]:
        x = jnp.asarray(rng.random(tbl).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, tbl, n).astype(np.int32))

        f = jax.jit(lambda ix, xx: jnp.take(xx, ix))
        secs = time_jitted(f, idx, x, iters=50)
        bps = n * 8 / secs  # 4B idx read + 4B out write (+ table reads)
        print(f"{name:10s} {secs*1e3:8.3f} ms  {n/secs/1e9:6.2f} Gelem/s "
              f"({bps/1e9:.1f} GB/s io-model)")

    rows = 1 << 20
    seg = np.sort(rng.integers(0, rows, n)).astype(np.int32)
    vals = jnp.asarray(rng.random(n).astype(np.float32))
    segj = jnp.asarray(seg)
    f = jax.jit(lambda v, s: jax.ops.segment_sum(
        v, s, num_segments=rows, indices_are_sorted=True))
    secs = time_jitted(f, vals, segj, iters=20)
    print(f"{'seg_sum':10s} {secs*1e3:8.3f} ms  {n/secs/1e9:6.2f} Gelem/s")

    # sliced-ELL reduction: 128-row slices, per-slice width ~ nnz/128;
    # model as one (W, 128) sum along axis 0 (the dominant inner shape)
    W = n // 128
    a = jnp.asarray(rng.random((W, 128)).astype(np.float32))
    b = jnp.asarray(rng.random((W, 128)).astype(np.float32))
    f = jax.jit(lambda u, v: jnp.sum(u * v, axis=0))
    secs = time_jitted(f, a, b, iters=50)
    print(f"{'slice_red':10s} {secs*1e3:8.3f} ms  {n/secs/1e9:6.2f} Gelem/s "
          f"({n*8/secs/1e9:.1f} GB/s stream)")


if __name__ == "__main__":
    main()
