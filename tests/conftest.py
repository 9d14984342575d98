import os

# Virtual 8-device CPU mesh (SURVEY.md §4 item 9): sharding logic is
# validated without TPU hardware.  Must be set before jax backend init.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The session may preset JAX_PLATFORMS (e.g. axon/TPU) and the site hook
# registers that plugin unconditionally — override via config, which wins.
# Tests need deterministic fp32 matmuls, so CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# The full suite compiles thousands of XLA programs; keeping them all live
# in one process has produced native crashes (SIGSEGV) near the end of the
# run.  Dropping compiled-program caches between modules bounds live
# executables; the persistent disk cache makes re-compiles cheap.
import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()
    gc.collect()


# `pytest -m core` fast subset (VERDICT r3 next-steps #10): substrate,
# loader, caches, kernels, generation engine, server — the files that
# gate every change; the long tail of per-family tests stays in the
# default run.
_CORE_MODULES = {
    "test_core", "test_models", "test_moe", "test_ssm", "test_batch",
    "test_fused_decode", "test_qmatmul", "test_int4_kv",
    "test_quantized_kv", "test_flash_attention", "test_turboquant",
    "test_detokenizer", "test_server", "test_structured_and_sampling",
    "test_quant_utils", "test_registry_coverage", "test_prompt_utils",
    "test_parallel", "test_speculative", "test_apc",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _CORE_MODULES:
            item.add_marker(pytest.mark.core)
