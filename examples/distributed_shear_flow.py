"""shear_flow over a domain decomposition - the distributed entry point.

Single process, all local devices (a TPU slice, or the virtual CPU mesh):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
    python examples/distributed_shear_flow.py

Multi-host (one process per host; see parallel/multihost.py and
SCALING.md "Multi-host execution"): call ``multihost.initialize()`` before
touching JAX - on TPU pods with no arguments (auto-config), or with
explicit coordinator/rank for manual launches - then run the identical
code below; the mesh spans every host's devices automatically and only
process 0 writes output.

The physics configuration is examples/shear_flow.py's; the driver swaps
``run`` for ``run_decomp`` over a 1-D x-slab mesh with ppermute halo
exchange (the floe count per slab must keep the halo margin under the
slab width - make_decomp raises otherwise).
"""

import time

import jax

from shear_flow import build
from subzero_tpu.parallel import make_decomp, run_decomp


def main(n_dt=500, n_floes=500):
    sim = build(n_dt=n_dt, out_dir="output/distributed_shear_flow",
                n_floes=n_floes)
    n_dev = min(len(jax.devices()), 4)  # 4 slabs keep margin < slab width
    dec = make_decomp(sim.model.floes, sim.model.domain, n_devices=n_dev)
    print(
        f"{jax.process_count()} process(es), {len(jax.devices())} devices, "
        f"{dec.n_dev} slabs (local_cap {dec.local_cap}, halo {dec.halo_cap})"
    )
    t0 = time.time()
    sim = run_decomp(sim, dec)
    print(f"ran {n_dt} steps in {time.time() - t0:.2f}s; "
          f"{int(sim.model.floes.count())} floes")


if __name__ == "__main__":
    main()
