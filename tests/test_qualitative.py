"""Qualitative behavior regression scenarios.

Ports /root/reference/test/qualitative_behavior.jl as cheap CI assertions:
each scenario has a documented expected behavior from the reference (where
the reference only eyeballs output videos, these tests assert the
distilled invariant).
"""

import numpy as np
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
    make_topography,
)
from subzero_tpu.core.floes import build_floes
from subzero_tpu.settings import (
    CollisionSettings,
    CouplingSettings,
    FloeSettings,
    SubGridPointsGenerator,
)
from subzero_tpu.simulation import Simulation, run_scan
from subzero_tpu.tools.fixtures import load_floe_shapes

FSET = FloeSettings(
    min_floe_area=0.0, subfloe_point_generator=SubGridPointsGenerator(2e3)
)
GRID = make_grid(-2.5e4, 1e5, -2.5e4, 1e5, dx=1e4, dy=1e4)
RECT = [[0.0, 0.0], [0.5e4, 0.0], [0.5e4, 2e4], [0.0, 2e4]]


def _sim(floes, ocean_u=0.0, ocean_v=0.0, atmos_u=0.0, domain=None,
         consts=None, collisions=True, dt=10, **kw):
    dtype = jnp.float64
    ocean = make_ocean(GRID, u=ocean_u, v=ocean_v, temp=0.0, dtype=dtype)
    atmos = make_atmos(GRID, u=atmos_u, v=0.0, temp=0.0, dtype=dtype)
    if domain is None:
        domain = make_domain(GRID, *([BoundaryKind.OPEN] * 4), dtype=dtype)
    model = make_model(GRID, ocean, atmos, domain, floes)
    kw.setdefault(
        "coupling_settings", CouplingSettings(two_way_coupling_on=False)
    )
    return Simulation(
        model=model,
        consts=consts or Constants(E=1e6),
        dt=dt,
        n_dt=0,
        floe_settings=FSET,
        collision_settings=CollisionSettings(collisions_on=collisions),
        **kw,
    )


def test_sim1_floe_reaches_meridional_ocean_velocity():
    """qualitative_behavior.jl sim 1: a stationary floe in a 1 m/s
    south-to-north ocean flow quickly reaches the ocean velocity and the
    approach follows the analytic drag solution v(t) = v0(1 - 1/(t/tau+1))
    (compare_results.jl:18-29)."""
    floes = build_floes([RECT], 0.25, 0.0, FSET, N=4, dtype=jnp.float64)
    consts = Constants(E=1e6, f=0.0, turn_angle=0.0)
    # dt=1: recompute the drag every step so the forcing isn't stale
    # relative to the short spin-up time scale (tau ~ 7.5 steps)
    sim = _sim(
        floes, ocean_v=1.0, consts=consts, collisions=False,
        coupling_settings=CouplingSettings(dt=1, two_way_coupling_on=False),
    )
    n_steps = 100
    sim, collected = run_scan(
        sim, n_steps, collect=lambda f, o: (f.v[0], f.centroid[0, 1])
    )
    vs, ys = np.asarray(collected[0]), np.asarray(collected[1])
    tau = 920.0 * 0.25 / (1027.0 * 3e-3 * 1.0)
    ts = (np.arange(n_steps) + 1) * 10.0
    analytic = 1.0 * (1 - 1 / (ts / tau + 1))
    sel = ts > 3 * tau
    assert np.all(np.abs(vs[sel] - analytic[sel]) < 0.12)
    assert vs[-1] > 0.9  # reached the ocean velocity
    assert ys[-1] > ys[0]  # flowed northward
    assert np.abs(np.asarray(collected[0])).max() <= 1.0 + 1e-6  # no overshoot


def test_sim2_coriolis_deflects_right_of_motion():
    """qualitative_behavior.jl sim 2: a floe pushed by a -15 m/s zonal
    (easterly) wind drifts to the RIGHT of its motion (northern-hemisphere
    Coriolis): westward drift acquires a northward component."""
    floes = build_floes([RECT], 0.25, 0.0, FSET, N=4, dtype=jnp.float64)
    sim = _sim(floes, atmos_u=-15.0, collisions=False)  # default f = 1.4e-4
    sim, collected = run_scan(
        sim, 300, collect=lambda f, o: (f.u[0], f.v[0])
    )
    us, vs = np.asarray(collected[0]), np.asarray(collected[1])
    assert us[-1] < 0  # drifting west with the wind
    assert vs[-1] > 0  # deflected north = right of westward motion
    assert abs(us).max() < 16.0  # bounded by the forcing


def test_sim3_bounce_off_wall_and_topography():
    """qualitative_behavior.jl sim 3: floes bounce off a collision wall and
    a topography element without gaining energy (no drag)."""
    dtype = jnp.float64
    topo = make_topography(
        [[[2e4, 0.0], [2.5e4, 0.0], [2.5e4, 2e4], [2e4, 2e4]]], dtype=dtype
    )
    C = BoundaryKind.COLLISION
    domain = make_domain(GRID, C, C, C, C, topography=topo, dtype=dtype)
    # floe 1 east of the topo moving west into it; floe 2 moving west into
    # the west collision wall
    f1 = [[3e4, 0.2e4], [3.5e4, 0.2e4], [3.5e4, 1.8e4], [3e4, 1.8e4]]
    f2 = [[-1.8e4, 0.2e4], [-1.3e4, 0.2e4], [-1.3e4, 1.8e4], [-1.8e4, 1.8e4]]
    floes = build_floes([f1, f2], 0.25, 0.0, FSET, N=4, dtype=dtype)
    floes = floes._replace(
        u=jnp.asarray([-3.0, -3.0, 0.0, 0.0]),
        p_dxdt=jnp.asarray([-3.0, -3.0, 0.0, 0.0]),
    )
    sim = _sim(
        floes, domain=domain, dt=10,
        coupling_settings=CouplingSettings(coupling_on=False),
    )
    from subzero_tpu.simulation import build_step

    step = build_step(sim)
    fl, oc, dm = sim.model.floes, sim.model.ocean, sim.model.domain
    u1_hist, u2_hist = [], []
    for k in range(600):
        fl, oc, dm, _ = step(fl, oc, dm, jnp.asarray(k))
        u = np.asarray(fl.u)
        u1_hist.append(u[0])
        u2_hist.append(u[1])
    u1 = np.asarray(u1_hist)
    u2 = np.asarray(u2_hist)
    assert u1.max() > 0.5   # floe 1 bounced off the topography (u reversed)
    assert u2.max() > 0.5   # floe 2 bounced off the west wall
    # elastic bounce with no drag must not gain appreciable energy
    assert np.abs(u1).max() < 3.5 and np.abs(u2).max() < 3.5
    assert int(fl.count()) == 2


def test_sim4_periodic_corner_wrap():
    """qualitative_behavior.jl sim 4: a floe with (1,1) velocity passes
    through the top-right corner of a doubly periodic domain and re-enters
    at the bottom-left (the min-image analog of the reference's 3 ghosts)."""
    dtype = jnp.float64
    domain = make_domain(GRID, *([BoundaryKind.PERIODIC] * 4), dtype=dtype)
    # note: make_grid floors 12.5 cells to 12, so the domain spans
    # [-2.5e4, 9.5e4] in both directions
    start = np.asarray(RECT) + np.asarray([8.7e4, 7.9e4])
    floes = build_floes([start.tolist()], 0.25, 0.0, FSET, N=4, dtype=dtype)
    floes = floes._replace(
        u=jnp.asarray([30.0, 0, 0, 0.0]),
        v=jnp.asarray([30.0, 0, 0, 0.0]),
        p_dxdt=jnp.asarray([30.0, 0, 0, 0.0]),
        p_dydt=jnp.asarray([30.0, 0, 0, 0.0]),
    )
    sim = _sim(
        floes, domain=domain, collisions=False,
        coupling_settings=CouplingSettings(coupling_on=False),
    )
    sim, collected = run_scan(
        sim, 60, collect=lambda f, o: f.centroid[0]
    )
    cents = np.asarray(collected)
    assert int(sim.model.floes.count()) == 1
    vals = np.asarray(domain.vals)
    n_, s_, e_, w_ = vals[0], vals[1], vals[2], vals[3]
    # the centroid never leaves the domain...
    assert cents[:, 0].max() <= e_ + 1e-6 and cents[:, 1].max() <= n_ + 1e-6
    assert cents[:, 0].min() >= w_ - 1e-6 and cents[:, 1].min() >= s_ - 1e-6
    # ...because both coordinates wrapped (one full-domain negative jump each)
    L = e_ - w_
    jx = np.diff(cents[:, 0])
    jy = np.diff(cents[:, 1])
    assert np.sum(jx < -L / 2) >= 1
    assert np.sum(jy < -L / 2) >= 1


def test_sim5_complex_floes_stay_stable():
    """qualitative_behavior.jl sim 5: a field of realistic strangely-shaped
    floes with small initial velocities bounces without going unstable."""
    dtype = jnp.float64
    rings = load_floe_shapes(max_verts=30)[:24]
    # the fixture shapes live in a ~[0, 6e4] box; recentre into the grid
    floes = build_floes(rings, 0.25, 0.0, FSET, N=32, dtype=dtype)
    rng = np.random.default_rng(8)
    n = len(rings)
    u = np.zeros(32)
    v = np.zeros(32)
    u[:n] = 0.1 * (rng.random(n) - 0.5)
    v[:n] = 0.1 * (rng.random(n) - 0.5)
    floes = floes._replace(u=jnp.asarray(u), v=jnp.asarray(v))
    sim = _sim(
        floes, collisions=True,
        coupling_settings=CouplingSettings(coupling_on=False),
    )
    sim, collected = run_scan(
        sim, 200, collect=lambda f, o: jnp.max(jnp.abs(f.u) + jnp.abs(f.v))
    )
    speeds = np.asarray(collected)
    assert np.isfinite(speeds).all()
    # bounded: no instability blow-up (reference: "without becoming unstable")
    assert speeds.max() < 10.0
    assert int(sim.model.floes.count()) > 0
