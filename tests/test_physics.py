"""Physics validation: analytic free-drift spin-up, integrator semantics.

The spin-up test mirrors /root/reference/test/compare_results.jl:18-29: a
floe in a uniform ocean current (no Coriolis, no atmosphere drag, no turning
angle) approaches the ocean velocity as

    u(t) = u0 * (1 - 1/(t/tau + 1)),   tau = rho_i*h / (rho_o*Cd*|u0|)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from subzero_tpu.constants import Constants
from subzero_tpu.core import (
    BoundaryKind,
    make_atmos,
    make_domain,
    make_grid,
    make_model,
    make_ocean,
)
from subzero_tpu.core.floes import build_floes
from subzero_tpu.settings import (
    CollisionSettings,
    CouplingSettings,
    FloeSettings,
    SubGridPointsGenerator,
)
from subzero_tpu.simulation import Simulation, run_scan


def test_spinup_matches_analytic():
    u0 = 0.25
    h = 0.25
    rho_i = 920.0
    consts = Constants(
        E=1e6, Cd_ia=0.0, Cd_ao=0.0, f=0.0, turn_angle=0.0, mu=0.0
    )
    tau = rho_i * h / (consts.rho_o * consts.Cd_io * u0)

    grid = make_grid(0.0, 1e5, 0.0, 1e5, Nx=10, Ny=10)
    ocean = make_ocean(grid, u=u0, v=0.0, temp=0.0, dtype=jnp.float64)
    atmos = make_atmos(grid, u=0.0, v=0.0, temp=0.0, dtype=jnp.float64)
    domain = make_domain(grid, *([BoundaryKind.PERIODIC] * 4), dtype=jnp.float64)
    fs = FloeSettings(
        min_floe_area=0.0, subfloe_point_generator=SubGridPointsGenerator(500.0)
    )
    square = [[4e4, 4e4], [6e4, 4e4], [6e4, 6e4], [4e4, 6e4]]
    floes = build_floes([square], 0.25, 0.0, fs, np.random.default_rng(0),
                        dtype=jnp.float64)
    model = make_model(grid, ocean, atmos, domain, floes)
    dt = 10
    n = 500
    sim = Simulation(
        model=model,
        consts=consts,
        dt=dt,
        n_dt=n,
        floe_settings=fs,
        coupling_settings=CouplingSettings(dt=1),
        collision_settings=CollisionSettings(collisions_on=False),
    )
    sim, series = run_scan(sim, n, collect=lambda f, o: f.u[0])
    us = np.asarray(series)
    ts = (np.arange(n) + 1) * dt
    analytic = u0 * (1 - 1 / (ts / tau + 1))
    # relative agreement with the analytic drag solution over the spin-up
    sel = ts > 200
    rel = np.abs(us[sel] - analytic[sel]) / u0
    assert rel.max() < 0.06, rel.max()
    # monotonic approach to ocean velocity
    assert us[-1] > 0.8 * analytic[-1]
    assert np.all(np.diff(us) > -1e-12)


def test_force_reduction_loop_semantics():
    """The factor-of-10 force reduction (update_floe.jl:487-491) matches the
    reference's while-loop exactly."""
    from subzero_tpu.physics.update_floe import timestep_floe_properties

    fs = FloeSettings(
        min_floe_area=0.0, subfloe_point_generator=SubGridPointsGenerator(1e9)
    )
    square = [[0.0, 0.0], [1e3, 0.0], [1e3, 1e3], [0.0, 1e3]]
    floes = build_floes([square], 0.25, 0.0, fs, np.random.default_rng(0),
                        dtype=jnp.float64)
    mass = float(floes.mass[0])
    dt = 10.0
    limit = mass / (5 * dt)
    for factor, divs in [(0.5, 0), (1.0, 0), (2.0, 1), (10.0, 1), (11.0, 2), (150.0, 3)]:
        f = floes._replace(
            collision_force=jnp.asarray([[limit * factor, 0.0]]),
        )
        out = timestep_floe_properties(f, dt, fs)
        # resulting dudt reflects force divided 10^divs times, then the
        # velocity cap |dt*dudt| <= h/2 (update_floe.jl:516-531)
        expect_force = limit * factor / (10 ** divs)
        expect_dudt = min(expect_force / mass, 0.25 / (2 * dt))
        got_dudt = float(out.p_dudt[0])
        assert np.isclose(got_dudt, expect_dudt, rtol=1e-12), (
            factor, divs, got_dudt * mass / limit
        )


def test_max_xi_clamp():
    from subzero_tpu.physics.update_floe import timestep_floe_properties

    fs = FloeSettings(
        min_floe_area=0.0, subfloe_point_generator=SubGridPointsGenerator(1e9)
    )
    square = [[0.0, 0.0], [1e3, 0.0], [1e3, 1e3], [0.0, 1e3]]
    floes = build_floes([square], 0.25, 0.0, fs, np.random.default_rng(0),
                        dtype=jnp.float64)
    f = floes._replace(trq_oa=jnp.asarray([1e12]))
    out = timestep_floe_properties(f, 10.0, fs)
    assert abs(float(out.xi[0])) <= fs.maximum_xi + 1e-18
