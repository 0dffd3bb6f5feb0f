"""Bit-exact checkpoint/resume.

A run resumed from a checkpoint (with the same settings) must reproduce the
continuous run exactly, including the host-side RNG stream used by fracture
and welding.  The reference explicitly cannot guarantee this (restart! does
not checkpoint RNG state, /root/reference/src/simulation_components/
simulation.jl:306-308); here the checkpoint stores the numpy Generator state
and restart() restores it.
"""

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
)
from subzero_tpu.core.fields import make_ocean
from subzero_tpu.io import (
    CheckpointOutputWriter,
    InitialStateOutputWriter,
    OutputWriters,
    restart,
)
from subzero_tpu.settings import (
    CouplingSettings,
    FloeSettings,
    FractureSettings,
    HiblerYieldCurve,
    MonteCarloPointsGenerator,
)
from subzero_tpu.simulation import Simulation, run


def _build(tmp_path, n_dt, with_writers):
    grid = make_grid(0.0, 1e5, 0.0, 1e5, Nx=10, Ny=10)
    ocean = make_ocean(grid, u=0.2, v=0.0, temp=0.0, dtype=jnp.float64)
    atmos = make_atmos(grid, temp=-1.0, dtype=jnp.float64)
    domain = make_domain(grid, *([BoundaryKind.PERIODIC] * 4), dtype=jnp.float64)
    fs = FloeSettings(
        min_floe_area=0.0,
        subfloe_point_generator=MonteCarloPointsGenerator(npoints=100),
    )
    floes = initialize_floe_field(
        6, [0.4], domain, 0.25, 0.0, fs, rng=np.random.default_rng(7),
        dtype=jnp.float64,
    )
    model = make_model(grid, ocean, atmos, domain, floes)
    writers = None
    if with_writers:
        writers = OutputWriters(
            initial_state=InitialStateOutputWriter(
                dir=str(tmp_path), overwrite=True
            ),
            checkpoint=CheckpointOutputWriter(10, dir=str(tmp_path), overwrite=True),
        )
    # very low fracture criteria so the RNG actually gets consumed
    frac = FractureSettings(
        fractures_on=True,
        criteria=HiblerYieldCurve(pstar=1e-10, c=20.0),
        dt=5,
        npieces=2,
    )
    settings = dict(
        consts=Constants(E=1e6),
        dt=10,
        floe_settings=fs,
        coupling_settings=CouplingSettings(two_way_coupling_on=False),
        fracture_settings=frac,
        seed=11,
    )
    return (
        Simulation(model=model, n_dt=n_dt, writers=writers, **settings),
        settings,
    )


def _snapshot(sim):
    fl = sim.model.floes
    act = np.asarray(fl.active)
    order = np.argsort(np.asarray(fl.id)[act])
    return {
        k: np.asarray(getattr(fl, k))[act][order]
        for k in ("id", "centroid", "u", "v", "xi", "height", "area", "nverts")
    }


def test_resume_bit_exact(tmp_path):
    # continuous run: 20 steps
    sim_c, _ = _build(tmp_path / "cont", 20, with_writers=False)
    run(sim_c)
    want = _snapshot(sim_c)

    # split run: 10 steps with checkpointing, then resume for the rest
    sim_a, settings = _build(tmp_path / "split", 10, with_writers=True)
    run(sim_a)
    sim_b, last = restart(
        str(tmp_path / "split" / "initial_state.h5"),
        str(tmp_path / "split" / "checkpoint.h5"),
        10,
        **settings,
    )
    assert last == 10
    assert sim_b.rng_state is not None
    run(sim_b, start_tstep=last)
    got = _snapshot(sim_b)

    assert want["id"].tolist() == got["id"].tolist()
    # fracture must actually have created new floes (RNG was consumed after
    # the checkpoint) for the bit-exactness to mean anything
    assert int(np.max(want["id"])) > 6
    for k in want:
        np.testing.assert_array_equal(want[k], got[k], err_msg=k)
