"""Multi-device SPMD tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

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
from subzero_tpu.parallel import make_mesh, sharded_step
from subzero_tpu.settings import CouplingSettings, FloeSettings, SubGridPointsGenerator
from subzero_tpu.simulation import Simulation, build_step


def make_sim(n_floes=16, dtype=jnp.float64):
    grid = make_grid(0.0, 1e5, 0.0, 1e5, Nx=10, Ny=10)
    ocean = make_ocean(grid, u=0.2, v=0.0, temp=0.0, dtype=dtype)
    atmos = make_atmos(grid, temp=-1.0, dtype=dtype)
    domain = make_domain(grid, *([BoundaryKind.PERIODIC] * 4), dtype=dtype)
    fs = FloeSettings(
        min_floe_area=1e6,
        subfloe_point_generator=SubGridPointsGenerator.from_grid(grid, 2),
    )
    floes = initialize_floe_field(
        n_floes, [0.6], domain, 0.25, 0.0, fs, rng=np.random.default_rng(1),
        dtype=dtype,
    )
    model = make_model(grid, ocean, atmos, domain, floes)
    return Simulation(
        model=model,
        consts=Constants(E=1e6),
        dt=20,
        n_dt=0,
        floe_settings=fs,
        coupling_settings=CouplingSettings(two_way_coupling_on=True),
    )


def test_sharded_step_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    sim = make_sim()
    # single-device result
    step = build_step(sim)
    m = sim.model
    f1, o1, d1, _ = step(m.floes, m.ocean, m.domain, jnp.asarray(0))

    # sharded result over 8 devices
    import copy

    sim2 = copy.copy(make_sim())
    mesh = make_mesh(8)
    sstep, floes, ocean, domain = sharded_step(sim2, mesh)
    f8, o8, d8, _ = sstep(floes, ocean, domain, jnp.asarray(0))

    N = f1.capacity
    act1 = np.asarray(f1.active)
    act8 = np.asarray(f8.active)[:N]
    assert (act1 == act8).all()
    np.testing.assert_allclose(
        np.asarray(f8.centroid)[:N][act1],
        np.asarray(f1.centroid)[act1],
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(f8.u)[:N][act1], np.asarray(f1.u)[act1], rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(o8.si_frac), np.asarray(o1.si_frac), rtol=1e-9, atol=1e-12
    )


def test_sharded_multi_step():
    sim = make_sim()
    mesh = make_mesh(8)
    sstep, floes, ocean, domain = sharded_step(sim, mesh)
    for k in range(5):
        floes, ocean, domain, overflow = sstep(
            floes, ocean, domain, jnp.asarray(k)
        )
    assert int(jnp.sum(floes.active)) > 0
