from .scalar import spmv_csr_scalar
from .window_ell import (
    CompositePlan,
    WindowEllPlan,
    build_composite,
    spmv_composite,
    spmv_window_ell,
)
from .ell_kernel import spmv_ell_device
from .reorder import ReorderedPlan, build_reordered, spmv_reordered

__all__ = [
    "spmv_csr_scalar",
    "WindowEllPlan",
    "spmv_window_ell",
    "CompositePlan",
    "build_composite",
    "spmv_composite",
    "spmv_ell_device",
    "ReorderedPlan",
    "build_reordered",
    "spmv_reordered",
]
