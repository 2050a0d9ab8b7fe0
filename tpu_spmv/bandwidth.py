"""Bandwidth metrics model (C13).

Re-design of the reference bandwidth layer (``include/spmv/bandwidth.h``,
``src/bandwidth.cpp``): theoretical peak per device, achieved bandwidth from
an explicit byte model, efficiency clamped to 1.0 (``bandwidth.cpp:52``).

Byte-accounting conventions preserved exactly so numbers stay comparable
with the reference (``BASELINE.md``):
  * CSR: read ``nnz*(4+4) + (rows+1)*4 + cols*4``, write ``rows*4``
    (``bandwidth.cpp:34-42``)
  * ELL: read ``rows*max_nnz*(4+4) + cols*4``, write ``rows*4``
    (``bandwidth.cpp:66-75``)

The reference derives peak from ``cudaGetDeviceProperties`` (memory clock x
bus width x 2, ``bandwidth.cpp:7-20``); PJRT exposes no memory clock, so the
TPU peak comes from a per-generation HBM table with an env override
(``TPU_SPMV_PEAK_GBS``) and a measured-STREAM fallback hook.
"""

from __future__ import annotations

import dataclasses
import os

import jax


@dataclasses.dataclass
class BandwidthMetrics:
    """Reference ``BandwidthMetrics`` (``bandwidth.h:10-18``)."""

    theoretical_gb_s: float
    achieved_gb_s: float
    efficiency: float  # achieved / theoretical, clamped to [0, 1]


# Published HBM peak bandwidth per TPU generation, GB/s.
# (v5e: 819 GB/s; v4: 1228 GB/s; v5p: 2765 GB/s; v6e "Trillium": 1640 GB/s.)
_TPU_PEAK_GBS = {
    "v2": 700.0,
    "v3": 900.0,
    "v4": 1228.0,
    "v5 lite": 819.0,
    "v5e": 819.0,
    "v5": 2765.0,   # v5p
    "v5p": 2765.0,
    "v6 lite": 1640.0,
    "v6e": 1640.0,
}

_MEASURED_PEAK_CACHE: dict[str, float] = {}


def get_tpu_peak_bandwidth(device=None) -> float:
    """Theoretical peak HBM bandwidth in GB/s for the target device
    (analog of ``get_gpu_peak_bandwidth``, ``bandwidth.cpp:7-20``).

    Resolution order: ``TPU_SPMV_PEAK_GBS`` env override → per-generation
    table keyed on ``device.device_kind`` → conservative default.
    """
    env = os.environ.get("TPU_SPMV_PEAK_GBS")
    if env:
        return float(env)
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    # longest-match against the table ("tpu v5 lite" should hit "v5 lite",
    # not "v5")
    best = None
    for key, val in _TPU_PEAK_GBS.items():
        if key in kind and (best is None or len(key) > len(best[0])):
            best = (key, val)
    if best:
        return best[1]
    if kind.startswith("cpu") or "cpu" in kind:
        return 100.0  # nominal host-DRAM figure for CPU test runs
    return 819.0


def measured_stream_bandwidth(device=None) -> float:
    """Measured STREAM-scale bandwidth (GB/s) — the denominator for the
    'fraction of STREAM' target in BASELINE.md.  Cached per device kind."""
    import numpy as np
    import jax.numpy as jnp
    from .timing import time_jitted

    if device is None:
        device = jax.devices()[0]
    key = getattr(device, "device_kind", "cpu")
    if key in _MEASURED_PEAK_CACHE:
        return _MEASURED_PEAK_CACHE[key]
    n = 1 << 26  # 256 MB
    x = jax.device_put(jnp.arange(n, dtype=jnp.float32), device)
    # fused read-reduce: one full HBM read pass, no output write — the
    # cleanest single-stream rate and the honest denominator for a
    # read-dominated SpMV
    secs = time_jitted(lambda v: jnp.sum(v * 1.0000001), x)
    gbs = n * 4 / secs / 1e9
    _MEASURED_PEAK_CACHE[key] = gbs
    return gbs


def _csr_bytes(num_rows: int, num_cols: int, nnz: int) -> int:
    """CSR byte model (``bandwidth.cpp:34-42``)."""
    read = nnz * (4 + 4) + (num_rows + 1) * 4 + num_cols * 4
    write = num_rows * 4
    return read + write


def _ell_bytes(num_rows: int, num_cols: int, max_nnz_per_row: int) -> int:
    """ELL byte model (``bandwidth.cpp:66-75``)."""
    read = num_rows * max_nnz_per_row * (4 + 4) + num_cols * 4
    write = num_rows * 4
    return read + write


def compute_bandwidth_csr(num_rows: int, num_cols: int, nnz: int,
                          elapsed_ms: float, device=None) -> BandwidthMetrics:
    """Reference ``compute_bandwidth_csr`` (``bandwidth.cpp:22-56``)."""
    peak = get_tpu_peak_bandwidth(device)
    if elapsed_ms <= 0.0:
        return BandwidthMetrics(peak, 0.0, 0.0)
    achieved = _csr_bytes(num_rows, num_cols, nnz) / (elapsed_ms * 1e-3) / 1e9
    eff = min(achieved / peak, 1.0) if peak > 0 else 0.0
    return BandwidthMetrics(peak, achieved, eff)


def compute_bandwidth_ell(num_rows: int, num_cols: int, max_nnz_per_row: int,
                          elapsed_ms: float, device=None) -> BandwidthMetrics:
    """Reference ``compute_bandwidth_ell`` (``bandwidth.cpp:58-88``)."""
    peak = get_tpu_peak_bandwidth(device)
    if elapsed_ms <= 0.0:
        return BandwidthMetrics(peak, 0.0, 0.0)
    achieved = _ell_bytes(num_rows, num_cols, max_nnz_per_row) \
        / (elapsed_ms * 1e-3) / 1e9
    eff = min(achieved / peak, 1.0) if peak > 0 else 0.0
    return BandwidthMetrics(peak, achieved, eff)
