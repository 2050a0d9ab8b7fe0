"""Profiling/observability utilities (SURVEY §5 'Tracing / profiling')."""

import jax.numpy as jnp

from tpu_spmv import profiling


def test_cost_analysis_reports_flops():
    def f(a, b):
        return a @ b

    costs = profiling.cost_analysis(f, jnp.ones((64, 64)), jnp.ones((64, 64)))
    assert isinstance(costs, dict)
    # XLA's cost model always reports flops for a matmul
    assert costs.get("flops", 0) > 0


def test_memory_analysis_reports_sizes():
    def f(a):
        return a * 2.0

    mem = profiling.memory_analysis(f, jnp.ones((128,)))
    assert isinstance(mem, dict)


def test_annotate_and_trace_contexts(tmp_path):
    with profiling.annotate("unit-test-region"):
        pass
    with profiling.trace(str(tmp_path / "trace")):
        jnp.ones((8,)).sum().block_until_ready()


def test_roofline_report_shapes(rng):
    """roofline_report works across plan kinds and reports consistent
    byte accounting (pattern plans stream strictly less)."""
    from tpu_spmv.kernels.window_ell import WindowEllPlan
    from tpu_spmv.profiling import roofline_report

    csr = rng.power_law_csr(2000, 1000, avg_nnz=10.0, alpha=1.6)
    nat = roofline_report(WindowEllPlan.build(csr, split_rows=128), 1e-4)
    pat = roofline_report(
        WindowEllPlan.build(csr, split_rows=128, pattern=True), 1e-4)
    assert nat["slots"] == pat["slots"] > 0
    assert pat["stream_bytes"] < 0.5 * nat["stream_bytes"]
    assert nat["ps_per_slot"] > 0 and nat["actual_gb_s"] > 0
