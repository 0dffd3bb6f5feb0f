"""Life-cycle process tests: fracture, fuse, weld, ridge/raft, smoothing.

Golden anchors from /root/reference/test/test_physical_processes/
test_fractures.jl and behavioral checks from test_simplification.jl,
test_ridge_raft.jl.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from subzero_tpu.core import BoundaryKind, make_domain, make_grid
from subzero_tpu.core.floes import build_floes
from subzero_tpu.geometry import host_clip
from subzero_tpu.physics import lifecycle_host as lh
from subzero_tpu.settings import (
    FloeSettings,
    FractureSettings,
    HiblerYieldCurve,
    RidgeRaftSettings,
    SimplificationSettings,
    SubGridPointsGenerator,
    WeldSettings,
)

FSET = FloeSettings(
    min_floe_area=1e6, subfloe_point_generator=SubGridPointsGenerator(5e8)
)

GRID = make_grid(-1e5, 1e5, -1e5, 1e5, dx=1e4, dy=1e4)
OPEN_DOMAIN = make_domain(GRID, *([BoundaryKind.OPEN] * 4), dtype=jnp.float64)

FRAC_STRESS = np.array([[-29955.396, -3428.008], [-3428.008, -1942.0464]])
FRAC_FLOE = [
    [-50548.186, -49995.968],
    [-50550.745, -37790.078],
    [-20856.010, -32518.566],
    [-20929.577, -49989.757],
]
SMALL_FLOE = [[1e3, 1e3], [1e3, 1.5e3], [1.5e3, 1.5e3], [1.5e3, 1e3]]
NO_FRAC_FLOE = [
    [1467.795, -25319.563],
    [1664.270, -25640.216],
    [-1105.179, -33458.936],
    [-17529.019, -50035.583],
    [-21193.828, -50088.777],
    [-21370.170, -32618.322],
    [-21247.656, -31077.536],
    [-12818.593, -27031.048],
]


class TestCriteria:
    def test_hibler_ellipse_golden(self):
        # test_fractures.jl:13-29
        ring = lh.hibler_yield_ellipse(0.5, 5e5, -1.0)
        assert np.isclose(host_clip.poly_area_np(ring), 49054437859.374, rtol=1e-4)
        assert np.allclose(
            host_clip.poly_centroid_np(ring), [-1.25e5, -1.25e5], atol=1.0
        )
        assert np.isclose(ring[:, 0].min(), -264743.588, atol=1e-2)
        assert np.isclose(ring[:, 0].max(), 14727.999, atol=1e-2)
        # test_fractures.jl:32-48
        ring = lh.hibler_yield_ellipse(0.25, 2.25e5, 20.0)
        assert np.isclose(host_clip.poly_area_np(ring), 2483380916.630, rtol=1e-4)
        assert np.allclose(
            host_clip.poly_centroid_np(ring), [-28125, -28125], atol=1.0
        )
        assert np.isclose(ring[:, 1].min(), -59567.307, atol=1e-2)
        assert np.isclose(ring[:, 1].max(), 3313.799, atol=1e-2)

    def test_mohrs_cone_golden(self):
        # test_fractures.jl:56-65
        v = lh.mohrs_cone_vertices(5.2, 2.5e5, -3.375e4)
        assert np.allclose(
            v,
            [[59523.809, 59523.809], [33750.0, -74500.0], [-74500.0, 33750.0]],
            atol=1e-2,
        )


def floes_with_stress():
    fl = build_floes(
        [FRAC_FLOE, FRAC_FLOE, NO_FRAC_FLOE, SMALL_FLOE],
        0.25,
        0.0,
        FSET,
        np.random.default_rng(0),
        dtype=jnp.float64,
        N=12,
    )
    stress = np.zeros((12, 2, 2))
    stress[0] = FRAC_STRESS
    stress[1] = FRAC_STRESS
    stress[3] = FRAC_STRESS
    return fl._replace(
        stress_accum=jnp.asarray(stress),
        u=fl.u.at[0].set(0.1),
        v=fl.v.at[0].set(-0.2),
        xi=fl.xi.at[0].set(0.05),
    )


class TestFracture:
    def test_determine_fractures(self):
        # test_fractures.jl:177-184: floes 1 & 2 fracture; 3 has no stress;
        # 4 is below min area
        fl = floes_with_stress()
        hf = lh.HostFloes(fl)
        idx = lh.determine_fractures(hf, HiblerYieldCurve(), FSET)
        assert idx == [0, 1]

    def test_determine_fractures_alpha_scaling(self):
        # _scale_principal_stress! (stress_calculators.jl:127-132): with a
        # large negative alpha the scaled eigenvalues shrink toward the
        # origin (inside the yield ellipse), so nothing fractures
        from subzero_tpu.settings import DecayAreaScaledCalculator

        fl = floes_with_stress()
        hf = lh.HostFloes(fl)
        fs_neg = FloeSettings(
            min_floe_area=1e6,
            subfloe_point_generator=SubGridPointsGenerator(5e8),
            stress_calculator=DecayAreaScaledCalculator(alpha=-10.0),
        )
        assert lh.determine_fractures(hf, HiblerYieldCurve(), fs_neg) == []
        # alpha = 0 reproduces the unscaled behavior
        fs_zero = FloeSettings(
            min_floe_area=1e6,
            subfloe_point_generator=SubGridPointsGenerator(5e8),
            stress_calculator=DecayAreaScaledCalculator(alpha=0.0),
        )
        assert lh.determine_fractures(hf, HiblerYieldCurve(), fs_zero) == [0, 1]

    def test_split_floe_conserves(self):
        # test_fractures.jl:208-237
        fl = floes_with_stress()
        hf = lh.HostFloes(fl)
        rng = np.random.default_rng(3)
        pieces = lh.split_floe(
            hf, 0, rng,
            FractureSettings(
                fractures_on=True, npieces=2, criteria=HiblerYieldCurve(), dt=75
            ),
            FSET, 10,
        )
        assert len(pieces) >= 2
        total_mass = sum(m for _, m in pieces)
        assert np.isclose(total_mass, float(fl.mass[0]), rtol=1e-9)
        # pieces fit within original floe
        ring0 = hf.ring(0)
        a0 = host_clip.poly_area_np(ring0)
        inter = sum(
            host_clip.poly_area_np(q)
            for p, _ in pieces
            for q in host_clip.intersect(p, ring0)
        )
        piece_area = sum(host_clip.poly_area_np(p) for p, _ in pieces)
        assert np.isclose(inter, piece_area, rtol=1e-6)

    def test_deform_floe_force_direction_golden(self):
        """deform_floe! golden (test_fractures.jl:186-205): displacing the
        deformer along the recorded contact-force vector
        [-279441968.984, -54223517.438] and re-differencing must land the
        deformed floe at the reference's exact centroid/area."""
        fl = floes_with_stress()
        hf = lh.HostFloes(fl)
        f = hf.fields
        ring_deformer = hf.ring(2)  # NO_FRAC_FLOE collides with floe 0
        init_overlap = sum(
            host_clip.poly_area_np(r)
            for r in host_clip.intersect(hf.ring(0), ring_deformer)
        )
        lh.deform_floe(
            hf, 0, ring_deformer, FloeSettings(), 10,
            np.random.default_rng(1),
            forces=(-279441968.984, -54223517.438),
        )
        post_overlap = sum(
            host_clip.poly_area_np(r)
            for r in host_clip.intersect(hf.ring(0), ring_deformer)
        )
        assert post_overlap < init_overlap
        assert np.allclose(
            f["centroid"][0], [-35115.567, -42531.500], atol=2e-1
        )
        assert np.isclose(f["area"][0], 431454521, atol=10)

    def test_fracture_floes_deform_on_uses_force_rows(self):
        """fracture_floes with deform_on consumes (i, j, area, fx, fy)
        interaction rows: the fracturing floe is deformed around its
        largest-overlap partner before splitting (fractures.jl:482-507)."""
        fl = floes_with_stress()
        fs2 = FractureSettings(
            fractures_on=True, npieces=2, criteria=HiblerYieldCurve(),
            dt=75, deform_on=True,
        )
        overlap = sum(
            host_clip.poly_area_np(r)
            for r in host_clip.intersect(
                np.asarray(FRAC_FLOE, float), np.asarray(NO_FRAC_FLOE, float)
            )
        )
        assert overlap > 0
        rows = [(0, 2, overlap, -279441968.984, -54223517.438)]
        out, max_id = lh.fracture_floes(
            fl, 4, np.random.default_rng(3), fs2, FSET, 10, overlaps=rows
        )
        act = np.asarray(out.active)
        assert max_id > 4 and act.sum() >= 4
        # mass conserved through deform (mass-preserving replace) + split
        assert np.isclose(
            float(jnp.sum(jnp.where(out.active, out.mass, 0.0))),
            float(jnp.sum(jnp.where(fl.active, fl.mass, 0.0))),
            rtol=1e-9,
        )

    def test_fracture_floes_pool(self):
        fl = floes_with_stress()
        fs2 = FractureSettings(
            fractures_on=True, npieces=3, criteria=HiblerYieldCurve(), dt=75
        )
        out, max_id = lh.fracture_floes(
            fl, 4, np.random.default_rng(3), fs2, FSET, 10
        )
        act = np.asarray(out.active)
        # two floes fractured into pieces; originals removed
        assert max_id > 4
        assert act.sum() >= 4  # 2 untouched + >= 2 pieces
        # mass conserved overall
        assert np.isclose(
            float(jnp.sum(jnp.where(out.active, out.mass, 0.0))),
            float(jnp.sum(jnp.where(fl.active, fl.mass, 0.0))),
            rtol=1e-9,
        )
        # pieces inherit parent velocity
        pieces = act & (np.asarray(out.parent_id) == 1)
        assert np.all(np.asarray(out.u)[pieces] == 0.1)


class TestFuse:
    def test_fuse_two_overlapping_squares(self):
        sq1 = [[0.0, 0.0], [3e3, 0.0], [3e3, 3e3], [0.0, 3e3]]
        sq2 = [[2e3, 0.0], [5e3, 0.0], [5e3, 3e3], [2e3, 3e3]]
        fl = build_floes(
            [sq1, sq2], 0.25, 0.0, FSET, np.random.default_rng(0),
            dtype=jnp.float64, N=4,
        )
        fl = fl._replace(
            u=jnp.asarray([0.1, -0.1, 0, 0]),
            fuse_with=jnp.asarray([1, 0, -1, -1], jnp.int32),
        )
        m0 = float(jnp.sum(jnp.where(fl.active, fl.mass, 0.0)))
        px0 = float(jnp.sum(jnp.where(fl.active, fl.mass * fl.u, 0.0)))
        out, max_id = lh.fuse_floes(fl, 2, FSET, 10, np.random.default_rng(0))
        act = np.asarray(out.active)
        assert act.sum() == 1
        keep = int(np.nonzero(act)[0][0])
        # mass and linear momentum conserved
        assert np.isclose(float(out.mass[keep]), m0, rtol=1e-9)
        assert np.isclose(
            float(out.mass[keep] * out.u[keep]), px0, rtol=1e-9
        )
        # fused area = union area (15e6 - overlap is inside union)
        assert np.isclose(float(out.area[keep]), 1.5e7, rtol=1e-6)
        assert max_id == 3


class TestWeld:
    def test_welding_fuses_overlapping(self):
        sq1 = [[0.0, 0.0], [3e3, 0.0], [3e3, 3e3], [0.0, 3e3]]
        sq2 = [[2.5e3, 0.0], [5.5e3, 0.0], [5.5e3, 3e3], [2.5e3, 3e3]]
        fl = build_floes(
            [sq1, sq2], 0.25, 0.0, FSET, np.random.default_rng(0),
            dtype=jnp.float64, N=4,
        )
        ws = WeldSettings(
            weld_on=True, dts=(10,), nxs=(1,), nys=(1,),
            min_weld_area=1e6, max_weld_area=1e9, welding_coeff=1000.0,
        )
        out, max_id = lh.timestep_welding(
            fl, 2, GRID, OPEN_DOMAIN, ws, FSET, 0, 10, np.random.default_rng(0)
        )
        act = np.asarray(out.active)
        assert act.sum() == 1
        keep = int(np.nonzero(act)[0][0])
        assert np.isclose(float(out.area[keep]), 1.65e7, rtol=1e-6)


class TestRidgeRaft:
    def test_floe_floe_ridge_transfers_mass(self):
        # two overlapping thick floes: loser's overlap area goes to gainer
        sq1 = [[0.0, 0.0], [1e4, 0.0], [1e4, 1e4], [0.0, 1e4]]
        sq2 = [[0.8e4, 0.0], [1.8e4, 0.0], [1.8e4, 1e4], [0.8e4, 1e4]]
        fl = build_floes(
            [sq1, sq2], 0.5, 0.0, FSET, np.random.default_rng(0),
            dtype=jnp.float64, N=6,
        )
        m0 = float(jnp.sum(jnp.where(fl.active, fl.mass, 0.0)))
        rr = RidgeRaftSettings(
            ridge_raft_on=True, dt=1, ridge_probability=1.0,
            raft_probability=0.0, min_ridge_height=0.2,
        )
        overlaps = [(0, 1, 0.2e4 * 1e4)]
        out, max_id = lh.timestep_ridging_rafting(
            fl, OPEN_DOMAIN, overlaps, 2, rr, FSET,
            SimplificationSettings(), 10, np.random.default_rng(1),
        )
        act = np.asarray(out.active)
        assert act.sum() == 2
        m1 = float(jnp.sum(jnp.where(out.active, out.mass, 0.0)))
        # total mass conserved (volume transferred, not destroyed)
        assert np.isclose(m1, m0, rtol=1e-6)
        # areas no longer overlap much: loser lost the overlap region
        areas = np.sort(np.asarray(out.area)[act])
        assert areas[0] < 1e8  # loser shrank
        heights = np.asarray(out.height)[act]
        assert heights.max() > 0.5  # gainer thickened

    def test_floe_domain_ridge_removes_overlap(self):
        # floe overlapping the east collision wall loses that area
        C = BoundaryKind.COLLISION
        dom = make_domain(GRID, C, C, C, C, dtype=jnp.float64)
        sq = [[9.5e4, 0.0], [10.5e4, 0.0], [10.5e4, 1e4], [9.5e4, 1e4]]
        fl = build_floes(
            [sq], 0.5, 0.0, FSET, np.random.default_rng(0),
            dtype=jnp.float64, N=4,
        )
        rr = RidgeRaftSettings(
            ridge_raft_on=True, dt=1, ridge_probability=1.0,
            raft_probability=0.0, max_domain_ridge_height=1.25,
        )
        overlaps = [(0, -3, 0.5e4 * 1e4)]  # east wall
        out, _ = lh.timestep_ridging_rafting(
            fl, dom, overlaps, 1, rr, FSET,
            SimplificationSettings(), 10, np.random.default_rng(1),
        )
        assert bool(out.active[0])
        assert float(out.area[0]) < 1e8 * 0.55  # lost the half beyond wall
        # by default domain_gain_probability=1 -> volume NOT added back
        assert float(out.height[0]) == 0.5


class TestSmooth:
    def test_smooth_reduces_vertices(self):
        # many-vertex circle-ish floe gets simplified below max_vertices
        th = np.linspace(0, 2 * np.pi, 32)[:-1]
        ring = np.stack([5e3 * np.cos(th), 5e3 * np.sin(th)], -1)
        fl = build_floes(
            [ring], 0.25, 0.0, FSET, np.random.default_rng(0),
            dtype=jnp.float64, N=2, V=40,
        )
        sp = SimplificationSettings(max_vertices=30, tol=150.0)
        out = lh.smooth_floes(fl, sp, FSET, 10, np.random.default_rng(0))
        assert int(out.nverts[0]) < 31
        # mass conserved
        assert np.isclose(float(out.mass[0]), float(fl.mass[0]), rtol=1e-12)


def test_interleaved_vs_endofstep_ridge_raft():
    """Bound the process-order deviation (PARITY.md): the reference runs
    ridge/raft mid-step (between collisions and coupling,
    simulation.jl:121-135); interleave_ridge_raft=True reproduces that,
    False runs it end-of-step.  On a fracture+ridge config the two orderings
    must agree within conservation-test-style tolerances."""
    from subzero_tpu.constants import Constants
    from subzero_tpu.core import (
        initialize_floe_field, make_atmos, make_model, make_ocean,
    )
    from subzero_tpu.settings import CouplingSettings
    from subzero_tpu.simulation import Simulation, run

    def build(interleave):
        dtype = jnp.float64
        grid = make_grid(0.0, 1e5, 0.0, 1e5, Nx=10, Ny=10)
        ocean = make_ocean(grid, u=0.0, v=0.0, temp=0.0, dtype=dtype)
        atmos = make_atmos(grid, temp=-1.0, dtype=dtype)
        domain = make_domain(grid, *([BoundaryKind.PERIODIC] * 4), dtype=dtype)
        fs = FloeSettings(
            min_floe_area=1e6,
            subfloe_point_generator=SubGridPointsGenerator.from_grid(grid, 2),
        )
        floes = initialize_floe_field(
            16, [0.6], domain, 0.5, 0.0, fs, rng=np.random.default_rng(11),
            dtype=dtype, N=256,
        )
        floes = floes._replace(
            u=jnp.where(floes.active, 0.2 * jnp.cos(floes.id * 1.7), 0.0),
            v=jnp.where(floes.active, 0.2 * jnp.sin(floes.id * 2.3), 0.0),
        )
        model = make_model(grid, ocean, atmos, domain, floes)
        return Simulation(
            model=model,
            consts=Constants(E=1e6, mu=0.0),
            dt=10, n_dt=200, seed=7,
            floe_settings=fs,
            coupling_settings=CouplingSettings(coupling_on=False),
            fracture_settings=FractureSettings(
                fractures_on=True,
                criteria=HiblerYieldCurve(pstar=1e-8, c=20.0),
                dt=100, npieces=2,
            ),
            ridgeraft_settings=RidgeRaftSettings(
                ridge_raft_on=True, dt=20,
                ridge_probability=1.0, min_overlap_frac=1e-4,
                domain_gain_probability=0.0,
            ),
            interleave_ridge_raft=interleave,
            pair_cap=64 * 256,
        )

    def summary(sim):
        f = sim.model.floes
        a = np.asarray(f.active)
        m = np.asarray(f.mass)[a]
        u = np.asarray(f.u)[a]
        v = np.asarray(f.v)[a]
        ke = 0.5 * np.sum(m * (u**2 + v**2))
        px = np.sum(m * u)
        py = np.sum(m * v)
        return m.sum(), ke, px, py

    mA, keA, pxA, pyA = summary(run(build(True)))
    mB, keB, pxB, pyB = summary(run(build(False)))
    # mass ledger identical up to remnant dissolution
    np.testing.assert_allclose(mA, mB, rtol=1e-2)
    # kinetic energy of the two orderings within conservation-style bounds
    scale = max(abs(keA), abs(keB))
    assert abs(keA - keB) <= 0.05 * scale, (keA, keB)
    # linear momentum agrees within 2.1% of the momentum scale (the
    # reference's complex-shape conservation tolerance)
    pscale = max(np.hypot(pxA, pyA), np.hypot(pxB, pyB), 1e-30)
    assert np.hypot(pxA - pxB, pyA - pyB) <= 0.021 * pscale
