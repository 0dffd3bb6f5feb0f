#!/usr/bin/env python
"""Distributed-lifecycle overhead: host-pass wall time and gathered-pool
size vs device count.

With the active-row compaction (parallel/decomp.py:gather_active) the
lifecycle gather transfers O(active floes), independent of the number of
devices and their per-slab padding; and the host pass itself operates on
the compact pool.  This script runs the same fracture-on problem as a 1-slab
and an 8-slab decomposition on the virtual CPU mesh and reports, per
lifecycle cadence: gathered pool capacity (= device->host rows) and host
pass wall time.

Run:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_ENABLE_X64=true \
  python tools/lifecycle_overhead.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp


def build_sim():
    from subzero_tpu.constants import Constants
    from subzero_tpu.core import (
        BoundaryKind, initialize_floe_field, make_atmos, make_domain,
        make_grid, make_model, make_ocean,
    )
    from subzero_tpu.settings import (
        CouplingSettings, FloeSettings, FractureSettings, HiblerYieldCurve,
        SubGridPointsGenerator,
    )
    from subzero_tpu.simulation import Simulation

    dtype = jnp.float64
    grid = make_grid(0.0, 8e5, 0.0, 1e5, Nx=40, Ny=5)
    ocean = make_ocean(grid, u=0.2, v=0.0, temp=0.0, dtype=dtype)
    atmos = make_atmos(grid, temp=-1.0, dtype=dtype)
    domain = make_domain(grid, *([BoundaryKind.PERIODIC] * 4), dtype=dtype)
    fs = FloeSettings(
        min_floe_area=1e6,
        subfloe_point_generator=SubGridPointsGenerator.from_grid(grid, 2),
    )
    floes = initialize_floe_field(
        512, [0.45], domain, 0.5, 0.1, fs, rng=np.random.default_rng(3),
        dtype=dtype, N=2048,
    )
    model = make_model(grid, ocean, atmos, domain, floes)
    return Simulation(
        model=model, consts=Constants(E=1e6), dt=10, n_dt=12, seed=1,
        floe_settings=fs,
        coupling_settings=CouplingSettings(two_way_coupling_on=False),
        fracture_settings=FractureSettings(
            fractures_on=True, criteria=HiblerYieldCurve(pstar=1e-10, c=20.0),
            dt=4, npieces=2,
        ),
        pair_cap=32 * 1024,
    )


def main():
    from subzero_tpu import simulation as S
    from subzero_tpu.parallel import decomp as D

    real = S._host_lifecycle_passes
    stats = {"t": 0.0, "n": 0, "caps": []}

    def timed(sim, floes, domain, tstep, rng, state, logger=None, **kw):
        t0 = time.perf_counter()
        out = real(sim, floes, domain, tstep, rng, state, logger, **kw)
        stats["t"] += time.perf_counter() - t0
        stats["n"] += 1
        stats["caps"].append(int(floes.capacity))
        return out

    for ndev in (1, len(jax.devices())):
        sim = build_sim()
        dec = D.make_decomp(sim.model.floes, sim.model.domain, n_devices=ndev)
        stats.update(t=0.0, n=0, caps=[])
        D._host_lifecycle_passes = timed
        S_orig = None
        # run_decomp imports _host_lifecycle_passes from simulation at call
        # time inside the module-level import; patch both modules
        import subzero_tpu.simulation as SM
        S_orig = SM._host_lifecycle_passes
        SM._host_lifecycle_passes = timed
        try:
            t0 = time.perf_counter()
            D.run_decomp(sim, dec)
            wall = time.perf_counter() - t0
        finally:
            SM._host_lifecycle_passes = S_orig
            D._host_lifecycle_passes = real
        n_act = int(jnp.sum(sim.model.floes.active))
        print(
            f"D={ndev}: total {wall:.2f}s, host passes {stats['n']} x "
            f"{stats['t']/max(stats['n'],1)*1e3:.1f} ms avg, gathered rows "
            f"{stats['caps']} (pool would be {ndev * dec.local_cap} rows "
            f"without compaction), final active {n_act}",
            flush=True,
        )


if __name__ == "__main__":
    main()
