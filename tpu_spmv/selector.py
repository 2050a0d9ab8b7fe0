"""Kernel auto-selector (C6).

Re-design of ``spmv_auto_config`` (``src/spmv_cpu.cpp:34-50``).  The decision
*structure* is preserved exactly — sparse-average → scalar, low-skew →
vector, high-skew → merge-path, large-x → cached-x knob — but every constant
is re-derived for TPU lane/sublane geometry instead of warp width 32:

* ``AVG_NNZ_SCALAR_THRESHOLD``: measured on TPU v5e, the packed Pallas
  kernel beats the flat XLA gather+scatter path even at ~1 nnz/row (31x at
  avg 1.2 — XLA's TPU scatter costs ~9 ns/element), so the scalar branch
  triggers only for near-empty matrices where plan overhead dominates.
  (Reference value 4, tuned for one-thread-per-row vs warp-per-row
  crossover, ``spmv_cpu.cpp:41``.)
* ``SKEWNESS_VECTOR_THRESHOLD``: skewness = max/(min+1) row length
  (``csr_matrix.cpp:297``).  Row splitting costs almost nothing on TPU
  (extras are folded into the kernel) and helps whenever any row is long,
  so the crossover to merge-path is at skew 4 (reference 10, tuned for
  warp imbalance, ``spmv_cpu.cpp:43``).  Measured: merge-path ≥ vector on
  every surveyed class (uniform avg-8: 6 µs vs 60 µs; power-law avg-24:
  52 µs vs 99 µs).
* ``use_vmem_x`` (texture analog): the reference enables the texture path
  only for large x (cols > 10000, ``spmv_cpu.cpp:37``); on TPU VMEM
  residency is *always* profitable but only *possible* while the padded x
  table fits VMEM, so the rule inverts into a capacity cap
  (``VMEM_X_MAX_COLS``).

Constants are module-level so the benchmark sweep (``benchmarks/tune.py``)
can re-derive and override them.
"""

from __future__ import annotations

from .csr import CSRMatrix
from .spmv import KernelType, PACKED_MAX_COLS, SpMVConfig

AVG_NNZ_SCALAR_THRESHOLD = 0.05
SKEWNESS_VECTOR_THRESHOLD = 4.0
DEFAULT_BLOCK_SIZE = 256


def spmv_auto_config(A: CSRMatrix) -> SpMVConfig:
    """Pick a kernel configuration from row statistics
    (reference ``spmv_auto_config``, ``spmv_cpu.cpp:34-50``)."""
    config = SpMVConfig()
    config.block_size = DEFAULT_BLOCK_SIZE
    # round 4: column strips (kernels/strips.py) serve x beyond the
    # packed cap — each strip is a VMEM-feasible column range on the
    # packed kernels — so use_vmem_x stays on at ANY width and the flat
    # path remains only for near-empty structure
    config.use_vmem_x = True

    stats = A.compute_stats()

    if stats.avg_nnz_per_row < AVG_NNZ_SCALAR_THRESHOLD:
        config.kernel_type = KernelType.SCALAR_CSR
    elif stats.skewness < SKEWNESS_VECTOR_THRESHOLD:
        config.kernel_type = KernelType.VECTOR_CSR
    else:
        config.kernel_type = KernelType.MERGE_PATH

    return config
