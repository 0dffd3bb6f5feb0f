"""Shared simulation builder for the multi-host (2-process) verification
harness: imported both by the pytest process (1-process baseline) and by
the spawned jax.distributed workers (tests/mh_worker.py), so both runs are
built from the identical seeded configuration."""

import numpy as np
import jax.numpy as jnp

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
from subzero_tpu.settings import (
    CouplingSettings,
    FloeSettings,
    FractureSettings,
    HiblerYieldCurve,
    SubGridPointsGenerator,
)
from subzero_tpu.simulation import Simulation


def build_sim(n_dt=10, fractures=True):
    """Wide (8:1) periodic domain, 128 Voronoi floes, forced fracture every
    4 steps - the same shape as test_parallel.make_wide_sim, frozen here so
    worker and baseline cannot drift apart."""
    grid = make_grid(0.0, 8e5, 0.0, 1e5, Nx=40, Ny=5)
    ocean = make_ocean(grid, u=0.2, v=0.0, temp=0.0, dtype=jnp.float64)
    atmos = make_atmos(grid, temp=-1.0, dtype=jnp.float64)
    domain = make_domain(grid, *([BoundaryKind.PERIODIC] * 4), dtype=jnp.float64)
    fs = FloeSettings(
        min_floe_area=1e6,
        subfloe_point_generator=SubGridPointsGenerator.from_grid(grid, 2),
    )
    # 256 floes -> rmax small enough that 8 x-slabs exceed the halo margin
    floes = initialize_floe_field(
        256, [0.45], domain, 0.25, 0.0, fs, rng=np.random.default_rng(3),
        dtype=jnp.float64,
    )
    model = make_model(grid, ocean, atmos, domain, floes)
    sim = Simulation(
        model=model,
        consts=Constants(E=1e6),
        dt=20,
        n_dt=n_dt,
        floe_settings=fs,
        coupling_settings=CouplingSettings(two_way_coupling_on=True),
        fracture_settings=FractureSettings(
            fractures_on=fractures,
            criteria=HiblerYieldCurve(pstar=1e-10, c=20.0),
            dt=4,
            npieces=2,
        ),
    )
    # generous budget: forced fracture doubles the pool twice, densifying
    # the contact graph well past the 8N default
    sim.pair_cap = 64 * sim.model.floes.capacity
    return sim


def final_state_summary(floes):
    """id-sorted arrays of the prognostic fields, for cross-run compare."""
    act = np.asarray(floes.active)
    ids = np.asarray(floes.id)[act]
    order = np.argsort(ids)
    return {
        "id": ids[order],
        "centroid": np.asarray(floes.centroid)[act][order],
        "u": np.asarray(floes.u)[act][order],
        "v": np.asarray(floes.v)[act][order],
        "xi": np.asarray(floes.xi)[act][order],
        "height": np.asarray(floes.height)[act][order],
        "mass": np.asarray(floes.mass)[act][order],
    }
