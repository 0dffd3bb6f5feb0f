"""Energy/momentum conservation property tests.

Mirrors /root/reference/test/test_conservation.jl: mini collision
simulations with friction off and coupling off must conserve kinetic energy
and linear/angular momentum to <1% over 5000 steps at dt=1.
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
    make_topography,
)
from subzero_tpu.core.floes import build_floes
from subzero_tpu.settings import (
    CouplingSettings,
    FloeSettings,
    SubGridPointsGenerator,
)
from subzero_tpu.simulation import Simulation, run_scan
from subzero_tpu.tools import drift_percent, floe_energy_momentum

GRID = make_grid(-2e4, 1e5, 0.0, 1e5, dx=1e4, dy=1e4)
O = BoundaryKind.OPEN
C = BoundaryKind.COLLISION

FSET = FloeSettings(
    min_floe_area=0.0, subfloe_point_generator=SubGridPointsGenerator(1e9)
)

FLOE1 = [[2e4, 2e4], [2e4, 5e4], [5e4, 5e4], [5e4, 2e4]]
FLOE2 = [[6e4, 2e4], [6e4, 5e4], [9e4, 5e4], [9e4, 2e4]]
FLOE3 = [[5.5e4, 2e4], [5.25e4, 4e4], [5.75e4, 4e4]]


def conservation_run(domain, coords, us, vs, xis, n_steps=5000):
    fl = build_floes(coords, 0.25, 0.0, FSET, np.random.default_rng(1),
                     dtype=jnp.float64)
    fl = fl._replace(
        u=jnp.asarray(us, jnp.float64),
        v=jnp.asarray(vs, jnp.float64),
        xi=jnp.asarray(xis, jnp.float64),
    )
    ocean_like = None
    from subzero_tpu.core import make_atmos, make_ocean

    ocean = make_ocean(GRID, 0.0, 0.0, 0.0, dtype=jnp.float64)
    atmos = make_atmos(GRID, 0.0, 0.0, 0.0, dtype=jnp.float64)
    model = make_model(GRID, ocean, atmos, domain, fl)
    area = np.asarray(fl.area)[np.asarray(fl.active)]
    modulus = 1.5e3 * (np.mean(np.sqrt(area)) + np.min(np.sqrt(area)))
    sim = Simulation(
        model=model,
        consts=Constants(E=float(modulus), mu=0.0),
        dt=1,
        n_dt=n_steps,
        floe_settings=FSET,
        coupling_settings=CouplingSettings(coupling_on=False),
    )
    sim, series = run_scan(
        sim, n_steps, collect=lambda floes, ocean: floe_energy_momentum(floes)
    )
    drift = drift_percent(series)
    return {k: float(v) for k, v in drift.items()}, sim


class TestConservation:
    def test_head_on_no_rotation(self):
        # test_conservation.jl:93-112
        domain = make_domain(GRID, O, O, O, O, dtype=jnp.float64)
        drift, sim = conservation_run(
            domain,
            [FLOE1, FLOE2],
            us=[0.15, -0.1],
            vs=[0.02, 0.02],
            xis=[1e-7, 0.0],
        )
        assert all(abs(v) < 1 for v in drift.values()), drift

    def test_offset_rotation(self):
        # test_conservation.jl:114-135: offset blocks -> rotation
        domain = make_domain(GRID, O, O, O, O, dtype=jnp.float64)
        floe2_shifted = [[x, y + 1e4] for x, y in FLOE2]
        drift, sim = conservation_run(
            domain,
            [FLOE1, floe2_shifted],
            us=[0.15, -0.1],
            vs=[0.02, 0.02],
            xis=[0.0, 0.0],
        )
        assert all(abs(v) < 1 for v in drift.values()), drift

    def test_three_floes(self):
        # three floes interacting (cf. test_conservation.jl three-floe case);
        # all initial totals nonzero so percent drift is well-defined
        domain = make_domain(GRID, O, O, O, O, dtype=jnp.float64)
        floe2_close = [[x - 1.5e3, y] for x, y in FLOE2]
        drift, sim = conservation_run(
            domain,
            [FLOE1, floe2_close, FLOE3],
            us=[0.15, -0.1, 0.0],
            vs=[0.02, 0.015, 0.01],
            xis=[1e-7, 0.0, 0.0],
        )
        assert all(abs(v) < 1 for v in drift.values()), drift

    def test_complex_shapes(self):
        # realistic non-convex floe outlines from the reference fixture
        # (test_conservation.jl:159-205 uses the same shapes; <2.1% drift)
        from subzero_tpu.tools.fixtures import load_floe_shapes

        shapes = load_floe_shapes(max_verts=30)
        # take two mid-sized shapes and place them on a collision course
        a = shapes[1] - shapes[1].mean(0)
        b = shapes[3] - shapes[3].mean(0)
        ra = np.abs(a).max()
        rb = np.abs(b).max()
        a = a + np.array([4e4, 4e4])
        b = b + np.array([4e4 + ra + rb + 2e3, 4e4])
        domain = make_domain(GRID, O, O, O, O, dtype=jnp.float64)
        drift, sim = conservation_run(
            domain,
            [a, b],
            us=[0.15, -0.1],
            vs=[0.02, 0.015],
            xis=[1e-7, 0.0],
        )
        assert all(abs(v) < 2.1 for v in drift.values()), drift

    def test_collision_walls_ke_bounded(self):
        # with collision walls momentum is exchanged with the walls, but
        # energy must not grow (cf. wall scenarios in test_conservation.jl)
        domain = make_domain(GRID, C, C, C, C, dtype=jnp.float64)
        drift, sim = conservation_run(
            domain,
            [FLOE1, FLOE2],
            us=[-0.3, 0.3],
            vs=[0.1, -0.1],
            xis=[0.0, 0.0],
            n_steps=3000,
        )
        assert drift["ke"] < 1.0, drift
