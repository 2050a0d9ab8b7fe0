"""Test configuration.

All property tests run on XLA-CPU (the free "fake backend" — the TPU-build
equivalent of the reference's requirement of a real GPU for every .cu test),
with 8 forced host devices so the multi-chip layer is tested single-process.
Set ``TPU_SPMV_TEST_TPU=1`` to run the same suite against real TPU hardware.
"""

import os

import jax  # noqa: E402

if os.environ.get("TPU_SPMV_TEST_TPU", "0") != "1":
    # config.update (not env vars) — TPU PJRT plugins can override
    # JAX_PLATFORMS, and XLA_FLAGS host-device forcing is ignored by
    # modern jaxlib.  Must run before the backend initializes.
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass
import pytest  # noqa: E402

from tpu_spmv.utils.testing import RandomGenerator  # noqa: E402

# Property-test iteration counts (reference: 100 for format/kernel
# properties, 50 for benchmark/pagerank; test_csr.cpp:10-14).  On real
# TPU hardware the reference intensity (100) is the gate; the
# interpret-mode CI slice defaults to 25 because interpret-mode Pallas
# recompiles per shape bucket.  Both remain env-overridable.
PROP_ITERS = int(os.environ.get("TPU_SPMV_PROP_ITERS", "100"))
_DEVICE_DEFAULT = "100" if os.environ.get("TPU_SPMV_TEST_TPU") == "1" else "25"
DEVICE_PROP_ITERS = int(os.environ.get("TPU_SPMV_DEVICE_PROP_ITERS",
                                       _DEVICE_DEFAULT))


@pytest.fixture
def rng():
    return RandomGenerator(42)


@pytest.fixture(scope="session")
def n_devices():
    return len(jax.devices())
