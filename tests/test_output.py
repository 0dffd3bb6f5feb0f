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
    # grid data: netCDF4-convention layout (unlimited time dim + scales)
    with h5py.File(tmp / "gridded_data.nc", "r") as f:
        assert list(f["time"][()]) == [0.0, 20.0, 40.0]
        assert f["si_frac_grid"].shape == (3, 5, 5)
        si = f["si_frac_grid"][0]
        assert 0.1 < si.sum() / 25 < 0.6  # roughly the 0.3 concentration
    # checkpoint + restart
    sim2, last = restart(
        str(tmp / "initial_state.h5"), str(tmp / "checkpoint.h5"), 10
    )
    assert last == 50
    n0 = int(sim2.model.floes.count())
    run(sim2, start_tstep=last)
    assert int(sim2.model.floes.count()) == n0


def test_interaction_rows_match_aggregates():
    """pair_interactions rows must sum to timestep_collisions' aggregate
    force/torque/overarea per floe (the reference's add_interactions!
    bookkeeping, collisions.jl:285-309)."""
    from subzero_tpu.core import BoundaryKind as BK
    from subzero_tpu.core.floes import build_floes
    from subzero_tpu.physics.collisions import (
        pair_interactions,
        timestep_collisions,
    )
    from subzero_tpu.settings import (
        CollisionSettings,
        FloeSettings,
        SubGridPointsGenerator,
    )

    fs = FloeSettings(
        min_floe_area=0.0, subfloe_point_generator=SubGridPointsGenerator(1e9)
    )
    grid = make_grid(-1e5, 1e5, -1e5, 1e5, Nx=10, Ny=10)
    domain = make_domain(grid, *([BK.OPEN] * 4), dtype=jnp.float64)
    sq = [[0.0, 0.0], [2e4, 0.0], [2e4, 2e4], [0.0, 2e4]]
    sq2 = (np.asarray(sq) + np.asarray([1.5e4, 0.5e4])).tolist()
    tri = [[2.8e4, 1e4], [4.8e4, 1e4], [3.8e4, 3e4]]
    floes = build_floes([sq, sq2, tri], 0.5, 0.0, fs, N=8, dtype=jnp.float64)
    floes = floes._replace(
        u=jnp.asarray([0.1, -0.1, -0.3, 0, 0, 0, 0, 0.0]),
    )
    consts = Constants(E=1e6)
    res = timestep_collisions(
        floes, domain, consts, 10.0, CollisionSettings(), 64 * 8
    )
    rows = pair_interactions(floes, domain, consts, 10.0, 64 * 8)
    v = np.asarray(rows["valid"])
    assert v.sum() >= 4  # two contacts, each with both-sided rows
    i = np.asarray(rows["i"])[v]
    j = np.asarray(rows["j"])[v]
    fx = np.asarray(rows["fx"])[v]
    fy = np.asarray(rows["fy"])[v]
    trq = np.asarray(rows["torque"])[v]
    ov = np.asarray(rows["overlap"])[v]
    # rows are two-sided for floe-floe contacts (reference bookkeeping,
    # output.jl:558-572): every floe-floe row must have its mirror present
    for k in range(len(i)):
        if j[k] >= 0:
            mirrored = (
                (i == j[k]) & (j == i[k])
                & np.isclose(fx, -fx[k]) & np.isclose(fy, -fy[k])
            )
            assert mirrored.any(), (i[k], j[k])
    n = floes.capacity
    agg_fx = np.zeros(n)
    agg_fy = np.zeros(n)
    agg_ov = np.zeros(n)
    for k in range(len(i)):
        agg_fx[i[k]] += fx[k]
        agg_fy[i[k]] += fy[k]
        agg_ov[i[k]] += ov[k]
    np.testing.assert_allclose(
        agg_fx, np.asarray(res.floes.collision_force)[:, 0], rtol=1e-9,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        agg_fy, np.asarray(res.floes.collision_force)[:, 1], rtol=1e-9,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        agg_ov, np.asarray(res.floes.overarea), rtol=1e-9, atol=1e-9
    )


def test_floe_writer_interactions_output(tmp_path):
    """FloeOutputWriter can emit the reference's interactions/num_inters
    diagnostics (output.jl:558-572)."""
    from subzero_tpu.io.writers import DEFAULT_FLOE_FIELDS

    grid = make_grid(0.0, 1e5, 0.0, 1e5, Nx=10, Ny=10)
    ocean = make_ocean(grid, u=0.1, v=0.0, temp=0.0, dtype=jnp.float64)
    atmos = make_atmos(grid, temp=-1.0, dtype=jnp.float64)
    domain = make_domain(grid, *([BoundaryKind.PERIODIC] * 4), dtype=jnp.float64)
    fs = FloeSettings(
        min_floe_area=0.0,
        subfloe_point_generator=MonteCarloPointsGenerator(npoints=100),
    )
    floes = initialize_floe_field(
        6, [0.6], domain, 0.25, 0.0, fs, rng=np.random.default_rng(2),
        dtype=jnp.float64,
    )
    model = make_model(grid, ocean, atmos, domain, floes)
    writers = OutputWriters(
        floes=FloeOutputWriter(
            5, dir=str(tmp_path), overwrite=True,
            outputs=tuple(DEFAULT_FLOE_FIELDS) + ("interactions",),
        ),
    )
    sim = Simulation(
        model=model,
        consts=Constants(E=1e6),
        dt=10,
        n_dt=10,
        floe_settings=fs,
        coupling_settings=CouplingSettings(two_way_coupling_on=False),
        writers=writers,
    )
    run(sim)
    with h5py.File(tmp_path / "floes.h5", "r") as f:
        assert "interactions" in f["5"]
        assert f["5/interactions"].shape[1] == 8
        assert "num_inters" in f["5"]


def test_analyze_floe_timeseries(sim):
    """tools/analyze_floe (working replacement for the reference's dead
    analyze_floe.jl): extract one floe's time series from the floes.h5
    output and render the diagnostic panel."""
    from subzero_tpu.tools.analyze_floe import (
        floe_timeseries,
        plot_floe_analysis,
    )

    s, tmp_path = sim
    run(s)
    path = os.path.join(str(tmp_path), "floes.h5")
    with h5py.File(path, "r") as f:
        fid = int(np.asarray(f["0"]["id"])[0])
    ts, d = floe_timeseries(path, fid, ("u", "centroid", "mass"))
    assert len(ts) == 6  # steps 0, 10, ..., 50
    assert d["centroid"].shape == (6, 2)
    assert np.all(d["mass"] > 0)
    pngs = plot_floe_analysis(path, fid, str(tmp_path / "analysis"))
    assert len(pngs) == 5 and all(os.path.exists(p) for p in pngs)


def test_grid_output_netcdf_conventions(tmp_path):
    """GridOutputWriter emits netCDF4-over-HDF5 (output.jl:681-752): an
    unlimited time dimension, x/y coordinate variables as HDF5 dimension
    scales attached to every variable (DIMENSION_LIST), and units/comments
    attributes ported from getattrs (output.jl:933-1000) - so xarray/ncdump
    can open the file without this package."""
    from subzero_tpu.core import BoundaryKind as BK
    from subzero_tpu.core.floes import build_floes
    from subzero_tpu.io.writers import GRID_ATTRS, GRID_OUTPUTS

    grid = make_grid(0.0, 1e5, 0.0, 1e5, Nx=10, Ny=10)
    domain = make_domain(grid, *([BK.OPEN] * 4), dtype=jnp.float64)
    from subzero_tpu.settings import FloeSettings as FS, SubGridPointsGenerator

    fs = FS(min_floe_area=0.0,
            subfloe_point_generator=SubGridPointsGenerator(1e9))
    sq = [[2e4, 2e4], [6e4, 2e4], [6e4, 6e4], [2e4, 6e4]]
    floes = build_floes([sq], 0.5, 0.0, fs, N=4, dtype=jnp.float64)
    ocean = make_ocean(grid, u=0.0, v=0.0, temp=0.0, dtype=jnp.float64)

    w = GridOutputWriter(10, dims=(4, 4), dir=str(tmp_path), overwrite=True,
                         dt=10.0)
    w.write(0, floes, ocean, grid)
    w.write(10, floes, ocean, grid)
    w.close()

    with h5py.File(tmp_path / "gridded_data.nc", "r") as f:
        # netCDF4 signature + the reference's file-level attribute
        assert f.attrs["_NCProperties"].startswith(b"version=2")
        assert "type" in f.attrs
        # dimension scales
        for dim in ("time", "x", "y"):
            assert f[dim].attrs["CLASS"] == b"DIMENSION_SCALE"
        assert f["time"].maxshape == (None,)
        assert list(f["time"][()]) == [0.0, 10.0]
        assert f["time"].attrs["units"] == "10 seconds"
        assert f["x"].attrs["units"] == "meters"
        # all 18 variables: (time, x, y) layout + attached scales + metadata
        assert set(GRID_OUTPUTS) == set(GRID_ATTRS)
        for name in GRID_OUTPUTS:
            v = f[name]
            assert v.shape == (2, 4, 4)
            assert "DIMENSION_LIST" in v.attrs
            assert v.dims[0][0] == f["time"]
            assert v.dims[1][0] == f["x"]
            assert v.dims[2][0] == f["y"]
            unit, comment = GRID_ATTRS[name]
            assert v.attrs["units"] == unit
            assert v.attrs["comments"] == comment
        # the lone floe covers 1.6e9 m^2 of the 1e10 m^2 domain
        si_total = f["si_frac_grid"][0].sum() / 16
        assert abs(si_total - 0.16) < 0.01
