import os

# Tests run on a virtual multi-device CPU mesh in double precision so that
# sharding logic is exercised without TPU hardware and golden numbers from the
# Float64 reference can be matched.
# Force-override: the ambient environment exports JAX_PLATFORMS=axon (TPU
# tunnel), which must not capture unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_ENABLE_X64"] = "true"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# The persistent compile cache is OPT-IN for tests: its background writer has
# segfaulted mid-suite on this 2-vCPU host (jax compilation_cache.py
# put_executable_and_time), killing otherwise-green runs.  Set
# SUBZERO_TEST_CACHE=1 to re-enable (big speedup on warm re-runs, at the cost
# of that risk).
if os.environ.get("SUBZERO_TEST_CACHE", "") == "1":
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
