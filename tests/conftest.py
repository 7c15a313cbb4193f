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
    config.addinivalue_line(
        "markers",
        "fast: core-correctness subset (`pytest -m fast` ≈ 3 min on a "
        "4-core box vs 17 for the full suite) — per-subsystem contracts "
        "for pre-commit iteration; the full suite stays the merge gate",
    )


# Core subsystems whose tests are individually cheap: numerics, kernels,
# model forward/decode, training step, serving engine, sharding specs.
# Excluded whole files are the expensive integration surfaces (ring/CP
# grad-parity on the 8-device mesh, HF-parity for every zoo family, engine
# stress tests) — covered by the full run.
_FAST_FILES = {
    "test_quant.py", "test_quant_matmul.py", "test_rmsnorm_kernel.py",
    "test_flash_attention.py", "test_decode_attention.py",
    "test_decode_arena_kernel.py", "test_split_kv.py", "test_sampling.py",
    "test_model.py", "test_training.py", "test_serving.py",
    "test_parallel.py", "test_block_table.py", "test_aux.py",
    "test_dropout_softcap.py", "test_data_hf_path.py",
}

# Individually slow tests (>15 s in the durations report) inside fast files.
_SLOW_TESTS = {
    "test_llama_logits_fp32",
    "test_qwen3_qk_norm_logits_fp32",
    "test_staggered_arrival",
    "test_hf_export_reloads_in_transformers",
    "test_data_parallel_multihost_engine_matches",
    "test_int8_train_dot_parity",
    "test_matches_single_pass",
    "test_amax_carriers",
    "test_sharded_forward_matches_single_device",
    "test_matches_unchunked",
    "test_kv_decode_matches_full",
    "test_decode_with_ragged_lens",
    "test_qwen_logits_fp32",
    "test_quantized_sharded_forward",
    "test_llama_quantize_params_halves_int8_bytes",
    "test_forward_close_and_grads_flow",
    "test_attention_chunk_backward",
    "test_trainer_parity",
    "test_remat_same_loss_and_grads",
    "test_grad_accum_equivalent",
    "test_train_step_emits_activation_stats",
    "test_concurrent_requests_isolated",
    "test_tensor_sharded_engine_matches",
    "test_llama_rope_scaling_parity",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for it in items:
        fname = it.fspath.basename
        base = it.name.split("[")[0]
        if fname in _FAST_FILES and base not in _SLOW_TESTS:
            it.add_marker(pytest.mark.fast)
