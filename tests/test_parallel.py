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
from subzero_tpu.settings import (
    CouplingSettings,
    FloeSettings,
    RidgeRaftSettings,
    SubGridPointsGenerator,
)
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


# ---------------------------------------------------------------------------
# Explicit 1-D domain decomposition (ppermute halos + migration)
# ---------------------------------------------------------------------------

from subzero_tpu.parallel import build_decomp_step, distribute, gather, make_decomp


def _match_by_id(fa, fb):
    """Return (state_a, state_b) rows of the two pools ordered by floe id."""
    ida = np.asarray(fa.id)[np.asarray(fa.active)]
    idb = np.asarray(fb.id)[np.asarray(fb.active)]
    assert sorted(ida.tolist()) == sorted(idb.tolist())

    def rows(f):
        act = np.asarray(f.active)
        order = np.argsort(np.asarray(f.id)[act])
        return {
            k: np.asarray(getattr(f, k))[act][order]
            for k in ("id", "centroid", "u", "v", "xi", "height", "area")
        }

    return rows(fa), rows(fb)


def make_wide_sim(n_floes=128, dtype=jnp.float64, **kw):
    """Wide (8:1) domain so 8 x-slabs each exceed the halo margin."""
    grid = make_grid(0.0, 8e5, 0.0, 1e5, Nx=40, Ny=5)
    ocean = make_ocean(grid, u=0.2, v=0.0, temp=0.0, dtype=dtype)
    atmos = make_atmos(grid, temp=-1.0, dtype=dtype)
    domain = make_domain(grid, *([BoundaryKind.PERIODIC] * 4), dtype=dtype)
    fs = FloeSettings(
        min_floe_area=1e6,
        subfloe_point_generator=SubGridPointsGenerator.from_grid(grid, 2),
    )
    floes = initialize_floe_field(
        n_floes, [0.45], domain, 0.25, 0.0, fs, rng=np.random.default_rng(3),
        dtype=dtype,
    )
    model = make_model(grid, ocean, atmos, domain, floes)
    return Simulation(
        model=model,
        consts=Constants(E=1e6),
        dt=20,
        n_dt=0,
        floe_settings=fs,
        coupling_settings=kw.pop(
            "coupling_settings", CouplingSettings(two_way_coupling_on=True)
        ),
        **kw,
    )


def test_decomp_matches_single_device():
    sim = make_wide_sim()
    m = sim.model
    # this config has a dense contact graph (large rmax): give both paths a
    # generous per-floe candidate budget so neither truncates
    sim.pair_cap = 32 * m.floes.capacity

    # --- single-device trajectory
    step = build_step(sim)
    f1, o1, d1 = m.floes, m.ocean, m.domain
    for k in range(5):
        f1, o1, d1, ov1 = step(f1, o1, d1, jnp.asarray(k))
        assert not bool(ov1)

    # --- decomposed trajectory over 4 x-slabs
    sim2 = make_wide_sim()
    m2 = sim2.model
    sim2.pair_cap = 32 * m2.floes.capacity
    dec = make_decomp(m2.floes, m2.domain, n_devices=4)
    fd = distribute(m2.floes, m2.domain, dec)
    dstep = build_decomp_step(sim2, dec)
    od, dd = m2.ocean, m2.domain
    overflow = None
    for k in range(5):
        fd, od, dd, overflow = dstep(fd, od, dd, jnp.asarray(k))
    assert not bool(overflow)

    fg = gather(fd)
    a, b = _match_by_id(f1, fg)
    # same physics through a different pair enumeration: allclose, not bitwise
    np.testing.assert_allclose(b["centroid"], a["centroid"], rtol=0, atol=1e-4)
    np.testing.assert_allclose(b["u"], a["u"], rtol=1e-4, atol=1e-10)
    np.testing.assert_allclose(b["v"], a["v"], rtol=1e-4, atol=1e-10)
    np.testing.assert_allclose(b["xi"], a["xi"], rtol=1e-4, atol=1e-12)
    np.testing.assert_allclose(b["height"], a["height"], rtol=1e-9)
    # ocean state (two-way coupling psum path) must be replicated-consistent
    np.testing.assert_allclose(
        np.asarray(od.si_frac), np.asarray(o1.si_frac), rtol=1e-4, atol=1e-10
    )


def test_decomp_migration():
    """Floes pushed across slab edges change owners without loss."""
    from subzero_tpu.settings import CollisionSettings

    sim = make_wide_sim(
        coupling_settings=CouplingSettings(coupling_on=False),
        collision_settings=CollisionSettings(collisions_on=False),
    )
    m = sim.model
    # strong eastward advection so floes cross slab edges (and the
    # periodic east boundary wraps ownership back to device 0)
    floes = m.floes._replace(
        u=jnp.where(m.floes.active, 500.0, 0.0),
        p_dudt=jnp.zeros_like(m.floes.p_dudt),
    )
    dec = make_decomp(floes, m.domain, n_devices=4)
    fd = distribute(floes, m.domain, dec)
    dstep = build_decomp_step(sim, dec)
    od, dd = m.ocean, m.domain
    n0 = int(jnp.sum(floes.active))
    ids0 = sorted(np.asarray(floes.id)[np.asarray(floes.active)].tolist())
    for k in range(60):
        fd, od, dd, overflow = dstep(fd, od, dd, jnp.asarray(k))
        assert not bool(overflow), f"capacity overflow at step {k}"
    fg = gather(fd)
    assert int(jnp.sum(fg.active)) == n0
    ids1 = sorted(np.asarray(fg.id)[np.asarray(fg.active)].tolist())
    assert ids0 == ids1


# ---------------------------------------------------------------------------
# Distributed end-to-end driver (run_decomp): device steps + host lifecycle
# at cadence (gather -> host passes -> redistribute) + writers
# ---------------------------------------------------------------------------

from subzero_tpu.parallel import run_decomp


def test_run_decomp_with_fracture(tmp_path):
    """run_decomp with fracture ON: host lifecycle at cadence over the
    decomposition, mass bookkeeping intact, writers fire (the distributed
    analog of timestep_sim!'s process order, simulation.jl:94-220)."""
    from subzero_tpu.io import (
        CheckpointOutputWriter,
        FloeOutputWriter,
        InitialStateOutputWriter,
        OutputWriters,
    )
    from subzero_tpu.settings import FractureSettings, HiblerYieldCurve

    sim = make_wide_sim(
        coupling_settings=CouplingSettings(two_way_coupling_on=False),
        fracture_settings=FractureSettings(
            fractures_on=True,
            criteria=HiblerYieldCurve(pstar=1e-10, c=20.0),
            dt=4,
            npieces=2,
        ),
    )
    sim.pair_cap = 32 * sim.model.floes.capacity
    sim.n_dt = 12
    sim.writers = OutputWriters(
        initial_state=InitialStateOutputWriter(dir=str(tmp_path), overwrite=True),
        floes=FloeOutputWriter(6, dir=str(tmp_path), overwrite=True),
        checkpoint=CheckpointOutputWriter(6, dir=str(tmp_path), overwrite=True),
    )
    m = sim.model
    mass0 = float(np.asarray(m.floes.mass)[np.asarray(m.floes.active)].sum())
    n0 = int(m.floes.count())
    dec = make_decomp(m.floes, m.domain, n_devices=4)
    sim = run_decomp(sim, dec)
    out = sim.model.floes
    act = np.asarray(out.active)
    n1 = int(act.sum())
    assert n1 > n0  # fracture actually created pieces
    # mass bookkeeping through fracture + redistribution: no creation, and
    # losses only from sub-min-area fracture pieces being dropped (the
    # reference's poly_to_floes! filter does the same)
    mass1 = float(np.asarray(out.mass)[act].sum())
    assert mass1 <= mass0 * (1 + 1e-9)
    np.testing.assert_allclose(mass1, mass0, rtol=1e-3)
    # writers produced files
    import h5py
    import os

    with h5py.File(os.path.join(str(tmp_path), "floes.h5"), "r") as f:
        assert sorted(int(k) for k in f.keys()) == [0, 6, 12]
    with h5py.File(os.path.join(str(tmp_path), "checkpoint.h5"), "r") as f:
        assert "floes/12" in f and "rng/12" in f


def test_run_decomp_matches_run_single():
    """With lifecycle off, run_decomp over 4 slabs tracks the single-device
    run() trajectory (allclose; pair enumeration differs)."""
    from subzero_tpu.simulation import run

    sim1 = make_wide_sim(
        coupling_settings=CouplingSettings(two_way_coupling_on=False)
    )
    sim1.pair_cap = 32 * sim1.model.floes.capacity
    sim1.n_dt = 5
    sim1 = run(sim1)

    sim2 = make_wide_sim(
        coupling_settings=CouplingSettings(two_way_coupling_on=False)
    )
    sim2.pair_cap = 32 * sim2.model.floes.capacity
    sim2.n_dt = 5
    dec = make_decomp(sim2.model.floes, sim2.model.domain, n_devices=4)
    sim2 = run_decomp(sim2, dec)

    a, b = _match_by_id(sim1.model.floes, sim2.model.floes)
    np.testing.assert_allclose(b["centroid"], a["centroid"], rtol=0, atol=1e-4)
    np.testing.assert_allclose(b["u"], a["u"], rtol=1e-4, atol=1e-10)
    np.testing.assert_allclose(b["height"], a["height"], rtol=1e-9)


def test_run_decomp_fuses_marked_pair():
    """A >55%-overlap pair on a non-first slab fuses correctly through the
    distributed driver.  Regression for the fuse_with indexing bug: the
    collision step marks partners by extended-pool ROW, which dangles after
    gather_active compaction renumbers rows (device-1 floes land at low
    host rows).  The distributed pools therefore carry partner IDs
    (_fuse_with_to_ids), remapped to rows on the gathered pool before the
    host fuse pass (_fuse_ids_to_rows)."""
    from subzero_tpu.core import initialize_floe_field_coords
    from subzero_tpu.settings import CollisionSettings

    grid = make_grid(0.0, 8e5, 0.0, 1e5, Nx=40, Ny=5)
    ocean = make_ocean(grid, u=0.0, v=0.0, temp=0.0, dtype=jnp.float64)
    atmos = make_atmos(grid, temp=-1.0, dtype=jnp.float64)
    domain = make_domain(
        grid, *([BoundaryKind.PERIODIC] * 4), dtype=jnp.float64
    )
    fs = FloeSettings(
        min_floe_area=1e6,
        subfloe_point_generator=SubGridPointsGenerator.from_grid(grid, 2),
    )

    def sq(x0, y0, s=2e4):
        return [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]]

    # two well-separated floes on slab 0, a 90%-overlap pair on slab 1
    coords = [
        sq(0.5e5, 3e4), sq(2.5e5, 3e4),
        sq(6.0e5, 4e4), sq(6.02e5, 4e4),
    ]
    floes = initialize_floe_field_coords(
        coords, domain, 0.25, 0.0, fs, rng=np.random.default_rng(0),
        dtype=jnp.float64,
    )
    model = make_model(grid, ocean, atmos, domain, floes)
    sim = Simulation(
        model=model,
        consts=Constants(E=1e6),
        dt=20,
        n_dt=1,
        floe_settings=fs,
        coupling_settings=CouplingSettings(coupling_on=False),
        collision_settings=CollisionSettings(),
    )
    act0 = np.asarray(floes.active)
    mass0 = float(np.asarray(floes.mass)[act0].sum())
    ids0 = set(np.asarray(floes.id)[act0].tolist())
    max_id0 = max(ids0)
    overlap_ids = {
        int(np.asarray(floes.id)[r])
        for r in np.nonzero(act0)[0]
        if np.asarray(floes.centroid)[r, 0] > 4e5
    }
    assert len(overlap_ids) == 2

    dec = make_decomp(floes, domain, n_devices=2)
    sim = run_decomp(sim, dec)
    out = sim.model.floes
    act = np.asarray(out.active)
    ids1 = set(np.asarray(out.id)[act].tolist())
    # the overlapping pair fused into one NEW floe; the slab-0 floes kept
    # their ids untouched (the pre-fix row-index bug fused the wrong rows)
    assert int(act.sum()) == 3
    assert ids1 & overlap_ids == set()
    assert ids0 - overlap_ids <= ids1
    assert max(ids1) > max_id0
    mass1 = float(np.asarray(out.mass)[act].sum())
    np.testing.assert_allclose(mass1, mass0, rtol=1e-9)


def test_run_decomp_interleaved_ridge_raft():
    """run_decomp with ridge/raft ON and interleave_ridge_raft (the
    default): the rr host pass runs at the reference's mid-step position
    between the distributed collide and finish halves (simulation.jl:
    108-135), carrying the per-floe instantaneous stress rows across the
    redistribution.  Volume must be conserved through ridge/raft mass
    transfer and the run must stay capacity-clean."""
    sim = make_wide_sim(
        coupling_settings=CouplingSettings(two_way_coupling_on=False),
        ridgeraft_settings=RidgeRaftSettings(
            ridge_raft_on=True, dt=3, ridge_probability=1.0,
            raft_probability=1.0, min_overlap_frac=0.0,
        ),
    )
    assert sim.interleave_ridge_raft
    sim.pair_cap = 32 * sim.model.floes.capacity
    sim.n_dt = 7
    m = sim.model
    act0 = np.asarray(m.floes.active)
    vol0 = float(
        (np.asarray(m.floes.area) * np.asarray(m.floes.height))[act0].sum()
    )
    dec = make_decomp(m.floes, m.domain, n_devices=4)
    with np.errstate(all="ignore"):
        sim = run_decomp(sim, dec)
    out = sim.model.floes
    act = np.asarray(out.active)
    assert act.sum() > 0
    vol1 = float((np.asarray(out.area) * np.asarray(out.height))[act].sum())
    np.testing.assert_allclose(vol1, vol0, rtol=1e-6)


def test_decomp_scaling_overhead():
    """Parallel overhead of the decomposed step on the virtual CPU mesh:
    8 slabs on shared host cores must stay within 50% of the 1-slab rate
    (the real-hardware efficiency proxy; see SCALING.md)."""
    from subzero_tpu.parallel import measure_decomp_scaling

    def builder():
        # 256 floes -> smaller rmax so 8 slabs each exceed the halo margin
        s = make_wide_sim(
            n_floes=256,
            coupling_settings=CouplingSettings(two_way_coupling_on=False),
        )
        s.pair_cap = 32 * s.model.floes.capacity
        return s

    res = measure_decomp_scaling(builder, n_steps=5)
    assert res["efficiency"] > 0.5, res
    # production driver (device-resident while_loop segment, what
    # run_decomp dispatches) must hold the same bound
    res_seg = measure_decomp_scaling(builder, n_steps=5, segment=True)
    assert res_seg["efficiency"] > 0.5, res_seg


# ---------------------------------------------------------------------------
# 2-D (x, y) decomposition groundwork
# ---------------------------------------------------------------------------

from subzero_tpu.parallel import (
    build_decomp_step_2d,
    distribute_2d,
    make_decomp_2d,
)


def make_square_sim(n_floes=256, dtype=jnp.float64, **kw):
    """Square 2e5 domain with enough floes that 2x2 slabs beat the margin."""
    grid = make_grid(0.0, 2e5, 0.0, 2e5, Nx=10, Ny=10)
    ocean = make_ocean(grid, u=0.15, v=-0.1, temp=0.0, dtype=dtype)
    atmos = make_atmos(grid, temp=-1.0, dtype=dtype)
    domain = make_domain(grid, *([BoundaryKind.PERIODIC] * 4), dtype=dtype)
    fs = FloeSettings(
        min_floe_area=1e6,
        subfloe_point_generator=SubGridPointsGenerator.from_grid(grid, 2),
    )
    floes = initialize_floe_field(
        n_floes, [0.5], domain, 0.25, 0.0, fs, rng=np.random.default_rng(9),
        dtype=dtype,
    )
    model = make_model(grid, ocean, atmos, domain, floes)
    return Simulation(
        model=model,
        consts=Constants(E=1e6),
        dt=20,
        n_dt=0,
        floe_settings=fs,
        coupling_settings=kw.pop(
            "coupling_settings", CouplingSettings(two_way_coupling_on=True)
        ),
        **kw,
    )


def test_decomp2d_matches_single_device():
    """A 2x2 (x, y) decomposition (corner halos via the two-pass exchange)
    tracks the single-device trajectory."""
    sim = make_square_sim()
    m = sim.model
    sim.pair_cap = 32 * m.floes.capacity
    step = build_step(sim)
    f1, o1, d1 = m.floes, m.ocean, m.domain
    for k in range(5):
        f1, o1, d1, ov1 = step(f1, o1, d1, jnp.asarray(k))
        assert not bool(ov1)

    sim2 = make_square_sim()
    m2 = sim2.model
    sim2.pair_cap = 32 * m2.floes.capacity
    dec = make_decomp_2d(m2.floes, m2.domain, n_dev=(2, 2))
    fd = distribute_2d(m2.floes, m2.domain, dec)
    dstep = build_decomp_step_2d(sim2, dec)
    od, dd = m2.ocean, m2.domain
    for k in range(5):
        fd, od, dd, overflow = dstep(fd, od, dd, jnp.asarray(k))
    assert not bool(overflow)

    fg = gather(fd)
    a, b = _match_by_id(f1, fg)
    np.testing.assert_allclose(b["centroid"], a["centroid"], rtol=0, atol=1e-4)
    np.testing.assert_allclose(b["u"], a["u"], rtol=1e-4, atol=1e-10)
    np.testing.assert_allclose(b["v"], a["v"], rtol=1e-4, atol=1e-10)
    np.testing.assert_allclose(b["height"], a["height"], rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(od.si_frac), np.asarray(o1.si_frac), rtol=1e-4, atol=1e-10
    )


def test_decomp2d_migration_across_corner():
    """A floe advected diagonally crosses both slab edges (x pass + y pass
    routing) without loss."""
    from subzero_tpu.settings import CollisionSettings

    sim = make_square_sim(
        coupling_settings=CouplingSettings(coupling_on=False),
        collision_settings=CollisionSettings(collisions_on=False),
    )
    m = sim.model
    floes = m.floes._replace(
        u=jnp.where(m.floes.active, 400.0, 0.0),
        v=jnp.where(m.floes.active, 400.0, 0.0),
    )
    dec = make_decomp_2d(floes, m.domain, n_dev=(2, 2))
    fd = distribute_2d(floes, m.domain, dec)
    dstep = build_decomp_step_2d(sim, dec)
    od, dd = m.ocean, m.domain
    n0 = int(jnp.sum(floes.active))
    ids0 = sorted(np.asarray(floes.id)[np.asarray(floes.active)].tolist())
    for k in range(40):
        fd, od, dd, overflow = dstep(fd, od, dd, jnp.asarray(k))
        assert not bool(overflow), f"capacity overflow at step {k}"
    fg = gather(fd)
    assert int(jnp.sum(fg.active)) == n0
    ids1 = sorted(np.asarray(fg.id)[np.asarray(fg.active)].tolist())
    assert ids0 == ids1


def test_run_decomp_2d_end_to_end():
    """run_decomp drives a 2-D (2x2) decomposition end-to-end: host
    lifecycle (fracture) at cadence over the gathered pool, piece count
    grows, and total mass is conserved."""
    from subzero_tpu.settings import FractureSettings, HiblerYieldCurve
    from subzero_tpu.simulation import run

    def build():
        s = make_square_sim(
            coupling_settings=CouplingSettings(two_way_coupling_on=False),
            fracture_settings=FractureSettings(
                fractures_on=True,
                criteria=HiblerYieldCurve(pstar=1e-10, c=20.0),
                dt=6,
                npieces=2,
            ),
        )
        s.pair_cap = 32 * s.model.floes.capacity
        s.n_dt = 8
        return s

    sim = build()
    m = sim.model
    mass0 = float(np.asarray(m.floes.mass)[np.asarray(m.floes.active)].sum())
    n0 = int(m.floes.count())
    dec = make_decomp_2d(m.floes, m.domain, n_dev=(2, 2))
    sim = run_decomp(sim, dec)
    out = sim.model.floes
    act = np.asarray(out.active)
    assert int(act.sum()) > n0  # fracture created pieces across slabs
    mass1 = float(np.asarray(out.mass)[act].sum())
    assert mass1 <= mass0 * (1 + 1e-9)
    np.testing.assert_allclose(mass1, mass0, rtol=1e-3)


def test_run_decomp_collect_conservation_series():
    """run_decomp(collect=...) accumulates additive per-step diagnostics
    device-side inside the distributed segments (psum across the mesh) and
    must match the single-device run(collect=...) series."""
    from subzero_tpu.simulation import run

    def collect(floes, ocean):
        m = jnp.where(floes.active, floes.mass, 0.0)
        return {
            "ke": jnp.sum(0.5 * m * (floes.u**2 + floes.v**2)),
            "px": jnp.sum(m * floes.u),
            "mass": jnp.sum(m),
        }

    sim1 = make_wide_sim(
        coupling_settings=CouplingSettings(two_way_coupling_on=False)
    )
    sim1.pair_cap = 32 * sim1.model.floes.capacity
    sim1.n_dt = 5
    sim1, want = run(sim1, collect=collect)

    sim2 = make_wide_sim(
        coupling_settings=CouplingSettings(two_way_coupling_on=False)
    )
    sim2.pair_cap = 32 * sim2.model.floes.capacity
    sim2.n_dt = 5
    dec = make_decomp(sim2.model.floes, sim2.model.domain, n_devices=4)
    sim2, got = run_decomp(sim2, dec, collect=collect)

    assert got["ke"].shape == want["ke"].shape == (6,)
    for k in ("ke", "px", "mass"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-6,
            err_msg=k,
        )
