from .scalar import spmv_csr_scalar
from .window_ell import WindowEllPlan, spmv_window_ell
from .ell_kernel import spmv_ell_device

__all__ = [
    "spmv_csr_scalar",
    "WindowEllPlan",
    "spmv_window_ell",
    "spmv_ell_device",
]
