"""Integration tests of the run() driver: process wiring, fusion trigger,
host life-cycle pass plumbing."""

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
from subzero_tpu.simulation import Simulation, run

GRID = make_grid(0.0, 1e5, 0.0, 1e5, Nx=10, Ny=10)
FSET = FloeSettings(
    min_floe_area=1e5, subfloe_point_generator=SubGridPointsGenerator(2e3)
)


def test_run_fuses_marked_pairs():
    # two floes overlapping >55%: the collision step marks them fuse and the
    # host pass must union them within one run() step
    sq1 = [[4e4, 4e4], [5e4, 4e4], [5e4, 5e4], [4e4, 5e4]]
    sq2 = [[4.2e4, 4e4], [5.2e4, 4e4], [5.2e4, 5e4], [4.2e4, 5e4]]
    floes = build_floes(
        [sq1, sq2], 0.25, 0.0, FSET, np.random.default_rng(0),
        dtype=jnp.float64, N=4,
    )
    domain = make_domain(GRID, *([BoundaryKind.OPEN] * 4), dtype=jnp.float64)
    model = make_model(
        GRID,
        make_ocean(GRID, 0, 0, 0, dtype=jnp.float64),
        make_atmos(GRID, 0, 0, 0, dtype=jnp.float64),
        domain,
        floes,
    )
    m0 = float(jnp.sum(jnp.where(floes.active, floes.mass, 0.0)))
    sim = Simulation(
        model=model,
        consts=Constants(E=1e6),
        dt=10,
        n_dt=1,
        floe_settings=FSET,
        coupling_settings=CouplingSettings(coupling_on=False),
    )
    sim = run(sim)
    out = sim.model.floes
    act = np.asarray(out.active)
    assert act.sum() == 1
    keep = int(np.nonzero(act)[0][0])
    assert np.isclose(float(out.mass[keep]), m0, rtol=1e-9)
    # union area ~ 1.2e4 wide x 1e4 tall
    assert np.isclose(float(out.area[keep]), 1.2e8, rtol=1e-3)


def test_run_fracture_deform_on():
    """run() with deform_on: the fracture branch materializes interaction
    rows (pair_interactions) so deform_floe gets the recorded contact-force
    direction (fractures.jl:482-507); two colliding floes under forced
    fracture produce deformed + split pieces with mass bookkeeping intact."""
    from subzero_tpu.settings import FractureSettings, HiblerYieldCurve

    # ~30% overlap: collides (real contact forces) without fuse-marking
    sq1 = [[3.0e4, 4e4], [4.4e4, 4e4], [4.4e4, 5e4], [3.0e4, 5e4]]
    sq2 = [[4.0e4, 4e4], [5.4e4, 4e4], [5.4e4, 5e4], [4.0e4, 5e4]]
    floes = build_floes(
        [sq1, sq2], 0.25, 0.0, FSET, np.random.default_rng(0),
        dtype=jnp.float64, N=8,
    )
    domain = make_domain(GRID, *([BoundaryKind.OPEN] * 4), dtype=jnp.float64)
    model = make_model(
        GRID,
        make_ocean(GRID, 0, 0, 0, dtype=jnp.float64),
        make_atmos(GRID, 0, 0, 0, dtype=jnp.float64),
        domain,
        floes,
    )
    m0 = float(jnp.sum(jnp.where(floes.active, floes.mass, 0.0)))
    n0 = int(jnp.sum(floes.active))
    sim = Simulation(
        model=model,
        consts=Constants(E=1e6),
        dt=10,
        n_dt=2,
        floe_settings=FSET,
        coupling_settings=CouplingSettings(coupling_on=False),
        fracture_settings=FractureSettings(
            fractures_on=True,
            criteria=HiblerYieldCurve(pstar=1e-10, c=20.0),  # always fracture
            dt=1,
            npieces=2,
            deform_on=True,
        ),
    )
    sim = run(sim)
    out = sim.model.floes
    act = np.asarray(out.active)
    assert int(act.sum()) > n0  # fracture produced pieces
    m1 = float(np.asarray(out.mass)[act].sum())
    np.testing.assert_allclose(m1, m0, rtol=1e-3)


def test_open_boundary_removal_in_run():
    sq = [[-1e3, 4e4], [5e3, 4e4], [5e3, 5e4], [-1e3, 5e4]]  # crosses west
    floes = build_floes(
        [sq], 0.25, 0.0, FSET, np.random.default_rng(0), dtype=jnp.float64, N=2
    )
    domain = make_domain(GRID, *([BoundaryKind.OPEN] * 4), dtype=jnp.float64)
    model = make_model(
        GRID,
        make_ocean(GRID, 0, 0, 0, dtype=jnp.float64),
        make_atmos(GRID, 0, 0, 0, dtype=jnp.float64),
        domain,
        floes,
    )
    sim = Simulation(
        model=model, consts=Constants(E=1e6), dt=10, n_dt=1,
        floe_settings=FSET,
        coupling_settings=CouplingSettings(coupling_on=False),
    )
    sim = run(sim)
    assert int(sim.model.floes.count()) == 0


def test_run_collect_matches_run_scan():
    """run(collect=...) accumulates per-step diagnostics device-side inside
    segments and must match run_scan's collect output exactly (same step
    function, same post-step collection point)."""
    from subzero_tpu.simulation import run_scan

    def build():
        sq1 = [[3e4, 4e4], [4e4, 4e4], [4e4, 5e4], [3e4, 5e4]]
        sq2 = [[5e4, 4e4], [6e4, 4e4], [6e4, 5e4], [5e4, 5e4]]
        floes = build_floes(
            [sq1, sq2], 0.25, 0.0, FSET, np.random.default_rng(0),
            dtype=jnp.float64, N=4,
        )
        floes = floes._replace(u=jnp.asarray([0.1, -0.1, 0.0, 0.0]))
        ocean = make_ocean(GRID, u=0.0, v=0.0, temp=0.0, dtype=jnp.float64)
        atmos = make_atmos(GRID, temp=-1.0, dtype=jnp.float64)
        domain = make_domain(GRID, *([BoundaryKind.OPEN] * 4), dtype=jnp.float64)
        model = make_model(GRID, ocean, atmos, domain, floes)
        return Simulation(
            model=model, consts=Constants(E=1e6), dt=10, n_dt=12,
            floe_settings=FSET,
            coupling_settings=CouplingSettings(coupling_on=False),
        )

    def collect(floes, ocean):
        m = jnp.where(floes.active, floes.mass, 0.0)
        return {
            "ke": jnp.sum(0.5 * m * (floes.u**2 + floes.v**2)),
            "px": jnp.sum(m * floes.u),
            "mass": jnp.sum(m),
        }

    sim = build()
    sim, got = run(sim, collect=collect)
    _, want = run_scan(build(), 13, start_tstep=0, collect=collect)
    assert got["ke"].shape == (13,)
    for k in ("ke", "px", "mass"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-12
        )
    # the two colliding floes exchange momentum but conserve it
    np.testing.assert_allclose(got["px"][-1], got["px"][0], rtol=1e-6)
