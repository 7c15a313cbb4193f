"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of testing distributed code single-host
(``torchrun --nproc_per_node=8 pytest`` in
``flash-attention-2.8.0/tests/modules/test_mha_parallel.py:1-2``) — but the
GSPMD equivalent needs no process launcher: XLA's CPU backend fakes N devices
in one process via ``--xla_force_host_platform_device_count``.

Set ``LLM_FP8_TEST_TPU=1`` to run the suite on the real TPU backend instead
(slower: every compile goes through the remote compile helper).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("LLM_FP8_TEST_TPU"):
    # The axon sitecustomize registers the TPU backend before conftest runs;
    # jax.config still lets us pick the platform as long as no computation has
    # been dispatched yet.
    jax.config.update("jax_platforms", "cpu")
    # Tight golden-test tolerances need full-precision matmuls on CPU. On TPU
    # this is NOT set: forcing 'highest' changes the Mosaic lowering of
    # kernel dots, and production runs use the default precision anyway —
    # TPU runs assert with relaxed tolerances instead.
    jax.config.update("jax_default_matmul_precision", "highest")
else:
    # TPU runs exercise the compiled kernels at production precision (f32
    # matmuls lower to bf16 passes on the MXU). Golden-value tests written
    # against CPU-exact numerics get a tolerance floor instead of per-test
    # dtype plumbing — correctness of the math is established by the strict
    # CPU run; the TPU run checks the compiled path produces the same values
    # up to hardware precision.
    #
    # The floor is *marker-aware*: tests whose assertions are about exact
    # semantics (bit-twiddle dequant vs astype, determinism-by-repetition,
    # checkpoint round-trips) opt out with ``@pytest.mark.exact`` and keep
    # their strict tolerances on TPU too — a 2e-2 floor there would mask
    # real kernel regressions.
    import numpy as _np

    _orig_allclose = _np.testing.assert_allclose
    _EXACT_TEST = {"active": False}

    def _tpu_allclose(actual, desired, rtol=1e-7, atol=0, **kw):
        if _EXACT_TEST["active"]:
            return _orig_allclose(actual, desired, rtol=rtol, atol=atol, **kw)
        return _orig_allclose(
            actual, desired, rtol=max(rtol, 2e-2), atol=max(atol, 2e-2), **kw
        )

    _np.testing.assert_allclose = _tpu_allclose

    import pytest as _pytest

    @_pytest.fixture(autouse=True)
    def _exact_marker(request):
        _EXACT_TEST["active"] = (
            request.node.get_closest_marker("exact") is not None
        )
        yield
        _EXACT_TEST["active"] = False


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "exact: assertions check exact semantics; the TPU tolerance floor "
        "must not apply",
    )
