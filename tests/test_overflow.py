"""Capacity-overflow flags must surface on every driver path.

The fixed-shape design truncates candidate/contact lists at static
capacities; silent truncation is the one failure mode that corrupts physics
without any error.  These tests force tiny capacities and assert the flag
fires through (a) the raw broad phase, (b) pair_overlaps (the host
lifecycle's overlap query), and (c) run_scan's accumulated warning.
"""

import warnings

import numpy as np
import jax.numpy as jnp
import pytest

from subzero_tpu.core import (
    BoundaryKind,
    initialize_floe_field,
    make_atmos,
    make_domain,
    make_grid,
    make_model,
    make_ocean,
)
from subzero_tpu.physics.collisions import (
    find_candidate_pairs,
    pair_overlaps,
    timestep_collisions,
)
from subzero_tpu.constants import Constants
from subzero_tpu.settings import (
    CollisionSettings,
    CouplingSettings,
    FloeSettings,
    SubGridPointsGenerator,
)
from subzero_tpu.simulation import Simulation, run_scan


def _dense_field(n=60, seed=3):
    grid = make_grid(0.0, 4e4, 0.0, 4e4, dx=2e3, dy=2e3)
    domain = make_domain(grid, *([BoundaryKind.PERIODIC] * 4), dtype=jnp.float64)
    fs = FloeSettings(
        min_floe_area=1e6,
        subfloe_point_generator=SubGridPointsGenerator(1e9),
    )
    floes = initialize_floe_field(
        n, [0.9], domain, 0.25, 0.0, fs, rng=np.random.default_rng(seed),
        dtype=jnp.float64, shrink_frac=0.0,
    )
    return grid, domain, fs, floes


def test_broad_phase_overflow_flag():
    _, domain, _, floes = _dense_field()
    big = find_candidate_pairs(floes, domain, 64 * floes.capacity)
    assert not bool(big.overflow)
    n_valid = int(jnp.sum(big.valid))
    assert n_valid > 8  # the field actually produces candidates
    # pair_cap so small that row_cap (pair_cap // N, floored at 8) truncates
    tiny = find_candidate_pairs(floes, domain, 8)
    assert bool(tiny.overflow) or int(jnp.sum(tiny.valid)) == n_valid


def test_pair_overlaps_overflow_flag(monkeypatch):
    _, domain, _, floes = _dense_field()
    i, j, area, valid, overflow = pair_overlaps(
        floes, domain, 64 * floes.capacity
    )
    assert not bool(overflow)
    n_full = int(jnp.sum(valid))
    assert n_full > 0
    # tiny row budget: either the second-chance list absorbs everything
    # (complete list, no flag) or the flag fires - never silent truncation
    i, j, area, valid, overflow = pair_overlaps(floes, domain, 8)
    assert bool(overflow) or int(jnp.sum(valid & (area > 0))) > 0
    # force the second-chance list itself to truncate: flag MUST fire
    from subzero_tpu.physics import collisions as C

    monkeypatch.setattr(C, "_extra_cap", lambda N: 1)
    i, j, area, valid, overflow = pair_overlaps(floes, domain, 8)
    assert bool(overflow)


def test_collisions_overflow_flag(monkeypatch):
    from subzero_tpu.physics import collisions as C

    _, domain, _, floes = _dense_field()
    monkeypatch.setattr(C, "_extra_cap", lambda N: 1)
    res = timestep_collisions(
        floes, domain, Constants(E=1e6), 10.0, CollisionSettings(), 8
    )
    assert bool(res.overflow)


def test_run_scan_overflow_warning(monkeypatch):
    from subzero_tpu.physics import collisions as C

    monkeypatch.setattr(C, "_extra_cap", lambda N: 1)
    grid, domain, fs, floes = _dense_field()
    ocean = make_ocean(grid, u=0.0, v=0.0, temp=0.0, dtype=jnp.float64)
    atmos = make_atmos(grid, u=0.0, v=0.0, temp=-1.0, dtype=jnp.float64)
    model = make_model(grid, ocean, atmos, domain, floes)
    sim = Simulation(
        model=model,
        consts=Constants(E=1e6),
        dt=10,
        n_dt=2,
        floe_settings=fs,
        coupling_settings=CouplingSettings(coupling_on=False),
        pair_cap=8,
    )
    with pytest.warns(UserWarning, match="capacity"):
        run_scan(sim, 3)


def test_run_scan_no_warning_when_capacity_ok():
    grid, domain, fs, floes = _dense_field()
    ocean = make_ocean(grid, u=0.0, v=0.0, temp=0.0, dtype=jnp.float64)
    atmos = make_atmos(grid, u=0.0, v=0.0, temp=-1.0, dtype=jnp.float64)
    model = make_model(grid, ocean, atmos, domain, floes)
    sim = Simulation(
        model=model,
        consts=Constants(E=1e6),
        dt=10,
        n_dt=2,
        floe_settings=fs,
        coupling_settings=CouplingSettings(coupling_on=False),
        pair_cap=64 * floes.capacity,
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        run_scan(sim, 3)


def test_two_way_window_overflow_flag():
    """A floe larger than its cell_cap x cell_cap two-way window must fire
    the coupling overflow flag instead of silently dropping point stress
    (the reference's CellStresses accumulates every point,
    coupling.jl:1329-1384); an adequate window must not."""
    from subzero_tpu.physics.coupling import timestep_coupling

    grid = make_grid(0.0, 4e4, 0.0, 4e4, dx=2e3, dy=2e3)
    domain = make_domain(grid, *([BoundaryKind.PERIODIC] * 4), dtype=jnp.float64)
    fs = FloeSettings(
        min_floe_area=1e6,
        subfloe_point_generator=SubGridPointsGenerator.from_grid(grid, 2),
    )
    floes = initialize_floe_field(
        4, [0.9], domain, 0.25, 0.0, fs, rng=np.random.default_rng(5),
        dtype=jnp.float64, shrink_frac=0.0,
    )
    ocean = make_ocean(grid, u=0.3, v=0.0, temp=0.0, dtype=jnp.float64)
    atmos = make_atmos(grid, u=0.0, v=0.0, temp=-1.0, dtype=jnp.float64)
    cps = CouplingSettings(two_way_coupling_on=True)
    consts = Constants()

    # adequate window (Simulation sizing formula)
    rmax = float(jnp.max(floes.rmax))
    cap_ok = int(2 * np.ceil(1.5 * rmax / 2e3) + 3)
    _, _, over = timestep_coupling(
        floes, grid, domain, ocean, atmos, consts, cps, fs, 10.0, cap_ok
    )
    assert not bool(over)

    # window too small for these floes -> must flag
    _, _, over = timestep_coupling(
        floes, grid, domain, ocean, atmos, consts, cps, fs, 10.0, 3
    )
    assert bool(over)


def test_second_chance_list_preserves_forces():
    """With the second-chance list, a tiny row budget must yield the SAME
    collision forces as a generous one (candidates spill instead of being
    dropped; only the accumulation order differs)."""
    _, domain, _, floes = _dense_field()
    big = timestep_collisions(
        floes, domain, Constants(E=1e6), 10.0, CollisionSettings(),
        64 * floes.capacity,
    )
    tiny = timestep_collisions(
        floes, domain, Constants(E=1e6), 10.0, CollisionSettings(), 8
    )
    assert not bool(big.overflow) and not bool(tiny.overflow)
    np.testing.assert_allclose(
        np.asarray(tiny.floes.collision_force),
        np.asarray(big.floes.collision_force),
        rtol=1e-9, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(tiny.floes.collision_trq),
        np.asarray(big.floes.collision_trq), rtol=1e-9, atol=1e-3,
    )
