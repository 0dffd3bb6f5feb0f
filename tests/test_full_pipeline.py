"""Full-pipeline run with topology changes ON: mass/volume bookkeeping.

VERDICT round-1 gap: the 5000-step conservation tests all ran with the
life-cycle off.  This exercises run() with fracture + ridge/raft + welding
+ smoothing + fusing enabled and asserts the global mass ledger closes:

    final floe mass + dissolved mass + open-boundary losses == initial mass
    (up to sub-min-area fracture pieces, which the reference also drops)

With all-periodic boundaries and domain_gain_probability = 0 there are no
boundary losses, so the ledger is floes + dissolved only.
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
)
from subzero_tpu.settings import (
    CouplingSettings,
    FloeSettings,
    FractureSettings,
    HiblerYieldCurve,
    RidgeRaftSettings,
    SimplificationSettings,
    SubGridPointsGenerator,
    WeldSettings,
)
from subzero_tpu.simulation import Simulation, run


def test_mass_ledger_with_lifecycle_on():
    dtype = jnp.float64
    grid = make_grid(0.0, 1e5, 0.0, 1e5, Nx=10, Ny=10)
    ocean = make_ocean(grid, u=0.3, v=0.1, temp=0.0, dtype=dtype)
    atmos = make_atmos(grid, temp=-1.0, dtype=dtype)
    domain = make_domain(grid, *([BoundaryKind.PERIODIC] * 4), dtype=dtype)
    fs = FloeSettings(
        min_floe_area=1e6,
        subfloe_point_generator=SubGridPointsGenerator.from_grid(grid, 2),
    )
    floes = initialize_floe_field(
        24, [0.6], domain, 0.5, 0.1, fs, rng=np.random.default_rng(6),
        dtype=dtype, N=512,
    )
    model = make_model(grid, ocean, atmos, domain, floes)
    sim = Simulation(
        model=model,
        consts=Constants(E=1e6),
        dt=10,
        n_dt=60,
        seed=5,
        floe_settings=fs,
        coupling_settings=CouplingSettings(two_way_coupling_on=False),
        fracture_settings=FractureSettings(
            fractures_on=True,
            criteria=HiblerYieldCurve(pstar=1e-9, c=20.0),
            dt=15,
            npieces=2,
        ),
        ridgeraft_settings=RidgeRaftSettings(
            ridge_raft_on=True, dt=10,
            ridge_probability=1.0, min_overlap_frac=0.001,
            domain_gain_probability=0.0,  # keep ridge volume on the floes
        ),
        weld_settings=WeldSettings(
            weld_on=True, dts=[20], nxs=[2], nys=[2],
            welding_coeff=1000.0, max_weld_area=1e10,
        ),
        simp_settings=SimplificationSettings(
            smooth_vertices_on=True, dt_smooth=25, max_vertices=20
        ),
        pair_cap=64 * 512,
    )
    act0 = np.asarray(floes.active)
    mass0 = float(np.asarray(floes.mass)[act0].sum())
    n0 = int(act0.sum())
    ids0_max = int(np.asarray(floes.id).max())

    sim = run(sim)
    out = sim.model.floes
    act = np.asarray(out.active)
    mass1 = float(np.asarray(out.mass)[act].sum())
    dissolved = float(np.asarray(sim.model.ocean.dissolved).sum())

    # topology actually changed (fracture made pieces and/or welds fused)
    assert int(np.asarray(out.id).max()) > ids0_max
    # the mass ledger closes: floes + dissolved ~ initial (sub-min-area
    # fracture remnants are the only legitimate leak)
    total = mass1 + dissolved
    assert total <= mass0 * (1 + 1e-9)
    np.testing.assert_allclose(total, mass0, rtol=5e-3)
    # heights stay within the configured bounds
    h = np.asarray(out.height)[act]
    assert (h >= fs.min_floe_height - 1e-12).all()
    assert (h <= fs.max_floe_height + 1e-12).all()
    # no NaNs anywhere in the prognostic state
    for k in ("centroid", "u", "v", "xi", "mass", "area"):
        assert np.isfinite(np.asarray(getattr(out, k))[act].reshape(-1)).all(), k
