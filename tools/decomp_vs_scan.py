"""Driver-discipline probe: run_decomp's device-resident segment runner vs
the single-device run_scan (pure lax.scan) on ONE device.

The round-3 distributed driver paid a host sync per step (bool(overflow) +
fuse check); round 4 folded the steps into one jitted lax.while_loop under
the shard_map (parallel/decomp.py:build_decomp_segment).  This probe
measures what remains of the driver gap: same physics, same pool, same
number of steps, 1-device mesh (so no communication), segment runner vs
lax.scan.  Target: decomp steps/s within ~15% of run_scan.

Usage (CPU):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/decomp_vs_scan.py

Measured 2026-08-21 (round 4), CPU backend (2 vCPUs), shear-flow-like
504-floe config, 200 steps, f64:
    run_scan      : 19.4 steps/s
    decomp segment: 20.2 steps/s   -> ratio 1.04
The while_loop segment matches scan throughput; the distributed driver's
discipline gap vs the single-device driver is closed.  Getting here also
required: owned_rows pruning of halo-row candidates in the broad phase
(physics/collisions.py), skipping halo exchange/migration on 1-slab axes,
and sizing the decomp pair budget at row_cap * local_cap (spill list
absorbs seam-row excess).
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=1"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from subzero_tpu.constants import Constants
from subzero_tpu.core import (
    BoundaryKind,
    initialize_floe_field,
    make_atmos,
    make_domain,
    make_grid,
    make_model,
    make_ocean,
)
from subzero_tpu.parallel import (
    build_decomp_segment,
    distribute,
    make_decomp,
)
from subzero_tpu.settings import (
    CollisionSettings,
    CouplingSettings,
    FloeSettings,
    SubGridPointsGenerator,
)
from subzero_tpu.simulation import Simulation, run_scan


def make_sim(n_floes=500):
    grid = make_grid(0.0, 1e5, 0.0, 1e5, Nx=51, Ny=51)
    ocean = make_ocean(grid, u=0.2, v=0.0, temp=0.0, dtype=jnp.float64)
    atmos = make_atmos(grid, temp=-1.0, dtype=jnp.float64)
    domain = make_domain(grid, *([BoundaryKind.PERIODIC] * 4), dtype=jnp.float64)
    fs = FloeSettings(
        min_floe_area=1e6,
        subfloe_point_generator=SubGridPointsGenerator.from_grid(grid, 2),
    )
    floes = initialize_floe_field(
        n_floes, [0.7], domain, 0.25, 0.0, fs, rng=np.random.default_rng(1),
        dtype=jnp.float64,
    )
    model = make_model(grid, ocean, atmos, domain, floes)
    return Simulation(
        model=model,
        consts=Constants(E=1e6),
        dt=10,
        n_dt=0,
        floe_settings=fs,
        coupling_settings=CouplingSettings(two_way_coupling_on=True),
        # max_overlap = 1.0: no fuse marking, so the segment runner never
        # exits early and both drivers advance the same number of steps
        collision_settings=CollisionSettings(floe_floe_max_overlap=1.0),
    )


def main(n_steps=200):
    # --- run_scan baseline --------------------------------------------------
    sim = make_sim()
    n_act = int(jnp.sum(sim.model.floes.active))
    # warmup/compile with the SAME n_steps (the scan length is baked into
    # the compiled program; a different length would recompile mid-timing)
    run_scan(sim, n_steps)
    sim = make_sim()
    t0 = time.perf_counter()
    run_scan(sim, n_steps)
    scan_sps = n_steps / (time.perf_counter() - t0)

    # --- decomp segment on a 1-device mesh ---------------------------------
    # local_cap pinned to the single-device pool capacity so both drivers
    # process the same number of rows (make_decomp's default 2x headroom is
    # for fracture growth, which this probe doesn't exercise)
    sim = make_sim()
    dec = make_decomp(
        sim.model.floes, sim.model.domain, n_devices=1,
        local_cap=sim.model.floes.capacity,
    )
    seg = build_decomp_segment(sim, dec)
    fd = distribute(sim.model.floes, sim.model.domain, dec)
    oc, dm = sim.model.ocean, sim.model.domain
    out = seg(fd, oc, dm, jnp.asarray(0, jnp.int32), jnp.asarray(2, jnp.int32))
    jax.block_until_ready(out[0].centroid)
    fd, oc, dm = out[0], out[1], out[2]
    t0 = time.perf_counter()
    out = seg(
        fd, oc, dm, jnp.asarray(2, jnp.int32),
        jnp.asarray(2 + n_steps, jnp.int32),
    )
    jax.block_until_ready(out[0].centroid)
    elapsed = time.perf_counter() - t0
    done = int(out[3]) - 2  # segment exits early when a fuse pair is marked
    assert done >= n_steps // 2, f"segment ended too early ({done} steps)"
    dec_sps = done / elapsed

    print(f"n_floes={n_act} steps={n_steps}")
    print(f"run_scan      : {scan_sps:8.1f} steps/s")
    print(f"decomp segment: {dec_sps:8.1f} steps/s")
    print(f"ratio (decomp/scan): {dec_sps / scan_sps:.3f}")


if __name__ == "__main__":
    main()
