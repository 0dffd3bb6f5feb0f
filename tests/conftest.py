import os
import resource

# XLA's CPU backend compiles the suite's largest programs (shard_map +
# while_loop segments) with deeply recursive LLVM/HLO passes; under the
# default 8 MB stack rlimit those compiles intermittently SEGFAULT the
# process mid-suite (observed in jax backend_compile_and_load and in the
# compile-cache writer, at different tests each run).  On Linux the main
# thread's stack grows on demand up to the soft rlimit, so raising it
# before JAX loads removes the crash without affecting anything else.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 512 << 20  # 512 MB
if _soft != resource.RLIM_INFINITY and _soft < _want:
    _new = _want if _hard == resource.RLIM_INFINITY else min(_want, _hard)
    resource.setrlimit(resource.RLIMIT_STACK, (_new, _hard))

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
