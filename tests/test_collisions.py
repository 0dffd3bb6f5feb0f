"""Collision golden-number tests.

Expected values come from the reference's
test/test_physical_processes/test_collisions.jl (themselves inherited from
the MATLAB SubZero lineage) - the primary behavioral anchors for parity.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from subzero_tpu.constants import Constants
from subzero_tpu.core import (
    BoundaryKind,
    make_domain,
    make_grid,
    make_topography,
)
from subzero_tpu.core.floes import build_floes
from subzero_tpu.physics.collisions import timestep_collisions
from subzero_tpu.settings import CollisionSettings, FloeSettings, SubGridPointsGenerator

DT = 10
CONSTS = Constants()
CSET = CollisionSettings()
FSET = FloeSettings(
    min_floe_area=0.0, subfloe_point_generator=SubGridPointsGenerator(1e9)
)

GRID = make_grid(-1e5, 1e5, -1e5, 1e5, dx=1e4, dy=1e4)
P = BoundaryKind.PERIODIC
C = BoundaryKind.COLLISION
O = BoundaryKind.OPEN

TOPO = make_topography(
    [[[1e4, 0.0], [0.0, 1e4], [1e4, 2e4], [2e4, 1e4]]], dtype=jnp.float64
)
# topo_domain: periodic N/S, collision E, open W, with topography
TOPO_DOMAIN = make_domain(GRID, P, P, C, O, topography=TOPO, dtype=jnp.float64)
OPEN_DOMAIN = make_domain(GRID, O, O, O, O, dtype=jnp.float64)
COLLISION_DOMAIN = make_domain(GRID, C, C, C, C, dtype=jnp.float64)


def floes_from(coords, us=None, vs=None, hmean=0.25):
    n = len(coords)
    us = us or [0.0] * n
    vs = vs or [0.0] * n
    fl = build_floes(coords, hmean, 0.0, FSET, np.random.default_rng(0),
                     dtype=jnp.float64)
    return fl._replace(u=jnp.asarray(us, jnp.float64), v=jnp.asarray(vs, jnp.float64))


def collide(fl, domain, pair_cap=64):
    return timestep_collisions(fl, domain, CONSTS, DT, CSET, pair_cap)


TRI = [[0.0, 0.0], [1e4, 3e4], [2e4, 0.0]]
CORNER_RECT = [[0.0, 2.5e4], [0.0, 2.9e4], [2e4, 2.9e4], [2e4, 2.5e4]]
CSHAPE = [
    [0.5e4, 2.7e4], [0.5e4, 3.5e4], [1.5e4, 3.5e4], [1.5e4, 2.7e4],
    [1.25e4, 2.7e4], [1.25e4, 3e4], [1e4, 3e4], [1e4, 2.7e4],
]


class TestFloeFloe:
    def test_triangle_rect_tip(self):
        # test_collisions.jl:52-62
        fl = floes_from([TRI, CORNER_RECT], us=[0.1, 0.0], vs=[0.0, -0.1])
        res = collide(fl, OPEN_DOMAIN)
        f = np.asarray(res.floes.collision_force)
        assert np.isclose(f[0, 0], -64613382.47, atol=1e-2)
        assert np.isclose(f[0, 1], -521498991.51, atol=1e-2)
        assert np.isclose(float(res.floes.overarea[0]), 8000000, atol=1e-2)
        assert np.isclose(
            float(res.floes.collision_trq[0]), 1069710443203.99, atol=2e-1
        )
        # equal and opposite reaction on the rectangle
        assert np.allclose(f[1], -f[0])
        assert not bool(jnp.any(res.floes.fuse_with >= 0))

    def test_cshape_two_regions(self):
        # test_collisions.jl:64-81 (sums over the two contact regions)
        fl = floes_from([CSHAPE, CORNER_RECT], us=[0.3, 0.0], vs=[0.0, -0.1])
        res = collide(fl, OPEN_DOMAIN)
        f = np.asarray(res.floes.collision_force)
        assert np.isclose(f[0, 0], -163013665.41 + -81506832.70, rtol=1e-6)
        assert np.isclose(f[0, 1], 804819565.60 + 402409782.80, rtol=1e-6)
        assert np.isclose(float(res.floes.overarea[0]), 1.5e7, rtol=1e-6)
        assert np.isclose(
            float(res.floes.collision_trq[0]),
            -2439177121266.03 + 1295472581868.05,
            rtol=1e-6,
        )

    def test_large_overlap_fuses(self):
        # test_collisions.jl:83-96: >55% overlap marks both floes fuse
        shifted = [[x + 0.5e4, y] for x, y in CORNER_RECT]
        fl = floes_from([CORNER_RECT, shifted], vs=[-0.1, -0.1])
        res = collide(fl, OPEN_DOMAIN)
        fw = np.asarray(res.floes.fuse_with)
        # one-sided marking: the pair's owner records the partner (the host
        # fuse pass handles a mark from either endpoint)
        assert (fw[0] == 1) != (fw[1] == 0) or (fw[0] == 1 and fw[1] == 0)
        assert fw[0] == 1 or fw[1] == 0
        assert np.allclose(np.asarray(res.floes.collision_force), 0.0)

    def test_middle_rect_fuses(self):
        middle = [[1.8e4, 2.7e4], [1.8e4, 2.8e4], [2.1e4, 2.8e4], [2.1e4, 2.7e4]]
        fl = floes_from([CORNER_RECT, middle], vs=[-0.1, 0.0])
        res = collide(fl, OPEN_DOMAIN)
        fw = np.asarray(res.floes.fuse_with)
        assert fw[0] == 1 or fw[1] == 0  # one-sided owner mark

    def test_tiny_overlap_no_force(self):
        # test_collisions.jl:98-102: overlap below min region area -> nothing
        big_shift = [[x + 1.9999999e4, y] for x, y in CORNER_RECT]
        fl = floes_from([CORNER_RECT, big_shift], vs=[-0.1, -0.1])
        res = collide(fl, OPEN_DOMAIN)
        assert np.allclose(np.asarray(res.floes.collision_force), 0.0)
        assert not bool(jnp.any(res.floes.fuse_with >= 0))


class TestFloeBoundary:
    def test_east_collision_wall(self):
        # test_collisions.jl:124-132
        coords = [[9.5e4, 0.0], [9e4, 0.5e4], [10e4, 2.5e4], [10.05e4, 2e4]]
        fl = floes_from([coords], us=[0.5], vs=[0.25])
        res = collide(fl, TOPO_DOMAIN)
        f = np.asarray(res.floes.collision_force)
        assert np.isclose(f[0, 0], -311304795.629, atol=1e-3)
        assert np.isclose(f[0, 1], -23618874.648, atol=1e-3)
        assert np.isclose(float(res.floes.overarea[0]), 1704545.454, atol=1e-3)

    def test_cshape_wall_two_regions(self):
        # test_collisions.jl:135-150 (sums)
        coords = [
            [9.5e4, 7e4], [9.5e4, 9e4], [1.05e5, 9e4], [1.05e5, 8.5e4],
            [9.9e4, 8.5e4], [9.9e4, 8e4], [1.05e5, 8e4], [1.05e5, 7e4],
        ]
        fl = floes_from([coords], vs=[-0.1])
        res = collide(fl, TOPO_DOMAIN)
        f = np.asarray(res.floes.collision_force)
        assert np.isclose(f[0, 0], -2876118708.17 + -5752237416.35, rtol=1e-6)
        assert np.isclose(f[0, 1], 575223741.63 + 1150447483.27, rtol=1e-6)
        assert np.isclose(float(res.floes.overarea[0]), 7.5e7, rtol=1e-6)

    def test_large_wall_overlap_removes(self):
        # test_collisions.jl:152-158
        coords = [[9e4, -7e4], [9e4, -5e4], [1.4e5, -5e4], [1.4e5, -7e4]]
        fl = floes_from([coords], us=[-0.4], vs=[0.2])
        res = collide(fl, TOPO_DOMAIN)
        assert bool(res.floes.remove[0])
        assert np.allclose(np.asarray(res.floes.collision_force), 0.0)

    def test_open_boundary_removes(self):
        # test_collisions.jl:167-170
        coords = [[-9.75e4, 7e4], [-9.75e4, 5e4], [-10.05e4, 5e4], [-10.05e4, 7e4]]
        fl = floes_from([coords])
        res = collide(fl, TOPO_DOMAIN)
        assert bool(res.floes.remove[0])

    def test_periodic_boundary_noop(self):
        # test_collisions.jl:172-175
        coords = [[5e4, 9.75e4], [5e4, 10.05e4], [7e4, 10.05e4], [7e4, 9.75e4]]
        fl = floes_from([coords])
        res = collide(fl, TOPO_DOMAIN)
        assert not bool(res.floes.remove[0])
        assert np.allclose(np.asarray(res.floes.collision_force), 0.0)

    def test_topography_overlap(self):
        # test_collisions.jl:177-182
        coords = [[-0.5e4, 0.0], [-0.5e4, 0.75e4], [0.5e4, 0.75e4], [0.5e4, 0.0]]
        fl = floes_from([coords])
        res = collide(fl, TOPO_DOMAIN)
        f = np.asarray(res.floes.collision_force)
        assert f[0, 0] < 0
        assert f[0, 1] < 0

    def test_corner_two_walls(self):
        # test_collisions.jl:184-188
        coords = [[9.5e4, 7e4], [9e4, 7.5e4], [10e4, 1.05e5], [10.05e4, 9.5e4]]
        fl = floes_from([coords])
        res = collide(fl, COLLISION_DOMAIN)
        f = np.asarray(res.floes.collision_force)
        assert f[0, 0] <= 0
        assert f[0, 1] <= 0
        assert abs(f[0, 0]) > 0 and abs(f[0, 1]) > 0


class TestInteractionRowGoldens:
    """Per-contact interaction rows vs the reference's per-row goldens
    (test_collisions.jl:54-81, 128-150): force application point, per-region
    force/torque/overlap, and the wall index encoding."""

    def _rows(self, fl, domain, pair_cap=64):
        from subzero_tpu.physics.collisions import pair_interactions

        r = pair_interactions(fl, domain, CONSTS, DT, pair_cap)
        v = np.asarray(r["valid"])
        return {k: np.asarray(r[k])[v] for k in
                ("i", "j", "fx", "fy", "px", "py", "torque", "overlap")}

    def test_triangle_rect_row(self):
        fl = floes_from([TRI, CORNER_RECT], us=[0.1, 0.0], vs=[0.0, -0.1])
        r = self._rows(fl, OPEN_DOMAIN)
        own = (r["i"] == 0) & (r["j"] == 1)
        assert own.sum() == 1
        k = np.nonzero(own)[0][0]
        assert np.isclose(r["fx"][k], -64613382.47, atol=1e-2)
        assert np.isclose(r["fy"][k], -521498991.51, atol=1e-2)
        assert np.isclose(r["px"][k], 10000.00, atol=1e-2)
        assert np.isclose(r["py"][k], 26555.55, atol=1e-2)
        assert np.isclose(r["overlap"][k], 8000000, atol=1e-2)
        assert np.isclose(r["torque"][k], 1069710443203.99, atol=2e-1)

    def test_cshape_two_region_rows(self):
        fl = floes_from([CSHAPE, CORNER_RECT], us=[0.3, 0.0], vs=[0.0, -0.1])
        r = self._rows(fl, OPEN_DOMAIN)
        own = (r["i"] == 0) & (r["j"] == 1)
        assert own.sum() == 2
        ks = np.nonzero(own)[0]
        # order by x of the force point (reference rows 1, 2)
        ks = ks[np.argsort(r["px"][ks])]
        np.testing.assert_allclose(
            r["fx"][ks], [-163013665.41, -81506832.70], rtol=1e-6
        )
        np.testing.assert_allclose(
            r["fy"][ks], [804819565.60, 402409782.80], rtol=1e-6
        )
        np.testing.assert_allclose(r["px"][ks], [7500.0, 13750.0], atol=1e-2)
        np.testing.assert_allclose(r["py"][ks], [28000.0, 28000.0], atol=1e-2)
        np.testing.assert_allclose(r["overlap"][ks], [1e7, 5e6], rtol=1e-6)
        np.testing.assert_allclose(
            r["torque"][ks], [-2439177121266.03, 1295472581868.05], rtol=1e-6
        )

    def test_east_wall_row(self):
        # diagonal floe against the east collision wall: j encoded -3
        # (test_collisions.jl:112, 124-133)
        small = [[9.5e4, 0.0], [9e4, 0.5e4], [10e4, 2.5e4], [10.05e4, 2e4]]
        fl = floes_from([small], us=[0.5], vs=[0.25])
        r = self._rows(fl, TOPO_DOMAIN)
        wall = r["j"] == -3
        assert wall.sum() == 1
        k = np.nonzero(wall)[0][0]
        assert np.isclose(r["fx"][k], -311304795.629, atol=1e-3)
        assert np.isclose(r["fy"][k], -23618874.648, atol=1e-3)
        assert np.isclose(r["overlap"][k], 1704545.454, atol=1e-3)
        assert np.isclose(r["px"][k], 100166.666, atol=1e-3)
        assert np.isclose(r["py"][k], 21060.606, atol=1e-3)


class TestCompactedNarrowPhase:
    """The large-N path compacts the padded candidate list to its valid
    pairs before the narrow phase (collisions.py: COMPACT_MIN_N).  Force the
    threshold down and check it reproduces the row-structured path exactly
    on mixed floe/wall/topo/periodic scenes."""

    def _both(self, fl, domain, monkeypatch, pair_cap=64):
        from subzero_tpu.physics import collisions as C

        ref = collide(fl, domain, pair_cap)
        monkeypatch.setattr(C, "COMPACT_MIN_N", 1)
        got = collide(fl, domain, pair_cap)
        return ref, got

    def _check(self, ref, got):
        np.testing.assert_allclose(
            np.asarray(got.floes.collision_force),
            np.asarray(ref.floes.collision_force), rtol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(got.floes.collision_trq),
            np.asarray(ref.floes.collision_trq), rtol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(got.floes.overarea),
            np.asarray(ref.floes.overarea), rtol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(got.stress_instant),
            np.asarray(ref.stress_instant), rtol=1e-12,
        )
        assert np.array_equal(
            np.asarray(got.floes.fuse_with), np.asarray(ref.floes.fuse_with)
        )
        assert np.array_equal(
            np.asarray(got.floes.remove), np.asarray(ref.floes.remove)
        )
        assert bool(got.overflow) == bool(ref.overflow)

    def test_floe_floe_and_walls(self, monkeypatch):
        fl = floes_from([TRI, CORNER_RECT, CSHAPE], us=[0.1, 0.0, 0.3],
                        vs=[0.0, -0.1, 0.0])
        self._check(*self._both(fl, COLLISION_DOMAIN, monkeypatch))

    def test_topo_periodic_open(self, monkeypatch):
        small = [[9.5e4, 0.0], [9e4, 0.5e4], [10e4, 2.5e4], [10.05e4, 2e4]]
        topo_hit = [[0.5e4, 0.2e4], [0.5e4, 1.5e4], [1.8e4, 1.5e4]]
        fl = floes_from([small, topo_hit], us=[0.5, 0.0], vs=[0.25, 0.0])
        self._check(*self._both(fl, TOPO_DOMAIN, monkeypatch))

    def test_fuse_marks(self, monkeypatch):
        shifted = [[x + 0.5e4, y] for x, y in CORNER_RECT]
        fl = floes_from([CORNER_RECT, shifted], vs=[-0.1, -0.1])
        self._check(*self._both(fl, OPEN_DOMAIN, monkeypatch))
