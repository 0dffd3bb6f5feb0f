"""Output round-trip tests (mirrors /root/reference/test/test_output.jl:2-106):
run a short sim with all four writers, assert file structure, then restart
from the checkpoint and continue.
"""

import os

import h5py
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
)
from subzero_tpu.core.fields import make_ocean
from subzero_tpu.io import (
    CheckpointOutputWriter,
    FloeOutputWriter,
    GridOutputWriter,
    InitialStateOutputWriter,
    OutputWriters,
    restart,
)
from subzero_tpu.settings import CouplingSettings, FloeSettings, MonteCarloPointsGenerator
from subzero_tpu.simulation import Simulation, run


@pytest.fixture
def sim(tmp_path):
    grid = make_grid(0.0, 1e5, 0.0, 1e5, Nx=10, Ny=10)
    ocean = make_ocean(grid, u=0.1, v=0.0, temp=0.0, dtype=jnp.float64)
    atmos = make_atmos(grid, temp=-1.0, dtype=jnp.float64)
    domain = make_domain(grid, *([BoundaryKind.PERIODIC] * 4), dtype=jnp.float64)
    fs = FloeSettings(
        min_floe_area=0.0,
        subfloe_point_generator=MonteCarloPointsGenerator(npoints=100),
    )
    floes = initialize_floe_field(
        4, [0.3], domain, 0.25, 0.0, fs, rng=np.random.default_rng(2),
        dtype=jnp.float64,
    )
    model = make_model(grid, ocean, atmos, domain, floes)
    writers = OutputWriters(
        initial_state=InitialStateOutputWriter(dir=str(tmp_path), overwrite=True),
        floes=FloeOutputWriter(10, dir=str(tmp_path), overwrite=True),
        grid=GridOutputWriter(20, dims=(5, 5), dir=str(tmp_path), overwrite=True),
        checkpoint=CheckpointOutputWriter(25, dir=str(tmp_path), overwrite=True),
    )
    return Simulation(
        model=model,
        consts=Constants(E=1e6),
        dt=10,
        n_dt=50,
        floe_settings=fs,
        coupling_settings=CouplingSettings(two_way_coupling_on=False),
        writers=writers,
    ), tmp_path


def test_writers_roundtrip(sim):
    sim, tmp = sim
    run(sim)
    # initial state
    n_floes = int(sim.model.floes.count())
    with h5py.File(tmp / "initial_state.h5", "r") as f:
        assert "floes" in f and "ocean" in f and "sim_json" in f.attrs
        assert f["floes/height"].shape[0] >= 4  # voronoi count is approximate
    # floes: groups every 10 steps
    with h5py.File(tmp / "floes.h5", "r") as f:
        keys = sorted(int(k) for k in f.keys())
        assert keys == [0, 10, 20, 30, 40, 50]
        assert "u" in f["10"] and "verts" in f["10"]
    # grid data
    with h5py.File(tmp / "gridded_data.h5", "r") as f:
        assert f["0/si_frac_grid"].shape == (5, 5)
        assert "u_grid" in f["20"]
        si = f["0/si_frac_grid"][()]
        assert 0.1 < si.sum() / 25 < 0.6  # roughly the 0.3 concentration
    # checkpoint + restart
    sim2, last = restart(
        str(tmp / "initial_state.h5"), str(tmp / "checkpoint.h5"), 10
    )
    assert last == 50
    n0 = int(sim2.model.floes.count())
    run(sim2, start_tstep=last)
    assert int(sim2.model.floes.count()) == n0
