"""Worker process of the 2-process multi-host verification harness.

Launched (twice) by tests/test_multihost.py:

    python tests/mh_worker.py <process_id> <coordinator_port> <out.npz>

Each worker joins the jax.distributed runtime with 4 virtual CPU devices
(2 processes x 4 = the same 8-device global mesh the single-process
baseline uses), runs the identical seeded simulation through run_decomp
over the cross-process mesh, and process 0 writes the final id-sorted pool
summary for the parent to compare."""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
out_path = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_ENABLE_X64"] = "true"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from subzero_tpu.parallel import multihost  # noqa: E402

multihost.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

from mh_common import build_sim, final_state_summary  # noqa: E402
from subzero_tpu.parallel import make_decomp, run_decomp  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

sim = build_sim()
dec = make_decomp(sim.model.floes, sim.model.domain, n_devices=8)
sim = run_decomp(sim, dec)

if multihost.is_io_process():
    np.savez(out_path, **final_state_summary(sim.model.floes))
print(f"[worker {pid}] done", flush=True)
