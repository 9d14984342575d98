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
