"""Floe-constructor and floe-utils goldens ported from the reference's
/root/reference/test/test_floe.jl and test_floe_utils.jl (MATLAB SubZero
lineage numbers where hard-coded there)."""

import numpy as np
import jax.numpy as jnp
import pytest

from subzero_tpu.core import (
    BoundaryKind,
    initialize_floe_field,
    make_domain,
    make_grid,
)
from subzero_tpu.core.init import initialize_floe_field_coords
from subzero_tpu.geometry import (
    pad_polygon,
    poly_centroid,
    poly_moment_inertia,
)
from subzero_tpu.geometry import host_clip
from subzero_tpu.geometry.host_clip import poly_area_np, poly_centroid_np
from subzero_tpu.settings import FloeSettings, SubGridPointsGenerator
from subzero_tpu.tools.fixtures import load_floe_shapes

FS = FloeSettings(
    min_floe_area=0.0, subfloe_point_generator=SubGridPointsGenerator(1e9)
)

GRID = make_grid(-8e4, 8e4, -8e4, 8e4, dx=1e4, dy=1e4)
DOMAIN = make_domain(GRID, *([BoundaryKind.COLLISION] * 4), dtype=jnp.float64)

# test_floe.jl:51-57
C_HOLE = [
    [[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0],
     [4.0, 0.0], [4.0, 6.0], [2.0, 6.0], [2.0, 0.0]],
    [[6.0, 4.0], [6.0, 6.0], [7.0, 6.0], [7.0, 4.0]],
]
RECT = [[0.0, 0.0], [0.0, 5.0], [10.0, 5.0], [10.0, 0.0]]


class TestMomentInertiaGoldens:
    """MATLAB-lineage moment-of-inertia goldens (test_floe_utils.jl:66-72).
    The reference's _calc_moment_inertia (floe_utils.jl:273-298) with
    default rho_i = 920."""

    def test_unit_square_golden(self):
        sq = [[0.0, 1.0], [0.0, 0.0], [1.0, 0.0], [1.0, 1.0]]
        v, n = pad_polygon(np.asarray(sq, float), 8)
        c = poly_centroid(v, n)
        got = float(poly_moment_inertia(v, n, c, 0.25, 920.0))
        assert np.isclose(got, 38.333, atol=1e-3)

    def test_triangle_golden(self):
        tri = np.asarray([[0.0, 1.0], [0.0, 0.0], [1.0, 0.0]]) * 6.67
        v, n = pad_polygon(tri, 8)
        c = poly_centroid(v, n)
        got = float(poly_moment_inertia(v, n, c, 0.5, 920.0))
        assert np.isclose(got, 50581.145, atol=1e-3)


class TestFloeFromCoords:
    """Floe constructor semantics (test_floe.jl:29-46)."""

    def test_fixture_floe_fields(self):
        shapes = load_floe_shapes(max_verts=30)
        ring = host_clip._clean_ring(np.asarray(shapes[0], float))
        want_area = poly_area_np(ring)
        want_cent = poly_centroid_np(ring)
        floes = initialize_floe_field_coords(
            [shapes[0]], DOMAIN, 0.5, 0.01, FS,
            rng=np.random.default_rng(1), dtype=jnp.float64,
        )
        act = np.asarray(floes.active)
        assert act.sum() == 1
        i = int(np.nonzero(act)[0][0])
        h = float(np.asarray(floes.height)[i])
        assert 0.49 <= h <= 0.51
        np.testing.assert_allclose(
            np.asarray(floes.centroid)[i], want_cent, rtol=1e-12
        )
        np.testing.assert_allclose(
            float(np.asarray(floes.area)[i]), want_area, rtol=1e-12
        )
        assert not bool(np.asarray(floes.remove)[i])
        # kinematics initialize to rest; ids assigned 1..n (floe.jl:409)
        assert float(np.asarray(floes.u)[i]) == 0.0
        assert int(np.asarray(floes.id)[i]) == 1

    def test_min_area_filter(self):
        # rect area 50 < min_floe_area 55 -> no floe (test_floe.jl:67-69)
        fs_small = FloeSettings(
            min_floe_area=55.0,
            subfloe_point_generator=SubGridPointsGenerator(1e9),
        )
        floes = initialize_floe_field_coords(
            [RECT], DOMAIN, 0.5, 0.0, fs_small,
        )
        assert int(np.asarray(floes.active).sum()) == 0

    def test_hole_split_into_three(self):
        # C-shape with a hole splits into 3 simple floes, total area exact
        # (poly_to_floes!, test_floe.jl:71-74)
        floes = initialize_floe_field_coords([C_HOLE], DOMAIN, 0.5, 0.0, FS)
        act = np.asarray(floes.active)
        assert int(act.sum()) == 3
        areas = np.asarray(floes.area)[act]
        # 10x10 square minus 2x6 notch minus 1x2 hole = 86
        np.testing.assert_allclose(areas.sum(), 86.0, rtol=1e-9)

    def test_ids_sequential_from_fixture(self):
        shapes = load_floe_shapes(max_verts=30)[:8]
        floes = initialize_floe_field_coords(
            shapes, DOMAIN, 0.5, 0.1, FS, rng=np.random.default_rng(1),
        )
        act = np.asarray(floes.active)
        ids = np.sort(np.asarray(floes.id)[act])
        assert (ids == np.arange(1, act.sum() + 1)).all()


class TestTopographyDeintersection:
    """Floes initialized around topography never overlap it
    (test_floe.jl:120-131, 160-183)."""

    ISLAND = [[6e4, 4e4], [6e4, 4.5e4], [6.5e4, 4.5e4], [6.5e4, 4e4]]
    TOPO1 = [
        [-8e4, -8e4], [-8e4, 8e4], [-6e4, 8e4], [-5e4, 4e4], [-6e4, -8e4]
    ]

    def _domain(self):
        from subzero_tpu.core import make_topography

        topo = make_topography([self.ISLAND, self.TOPO1], dtype=jnp.float64)
        return make_domain(
            GRID, *([BoundaryKind.COLLISION] * 4), topography=topo,
            dtype=jnp.float64,
        )

    def _no_topo_overlap(self, floes):
        act = np.nonzero(np.asarray(floes.active))[0]
        verts = np.asarray(floes.verts)
        nv = np.asarray(floes.nverts)
        for i in act:
            ring = verts[i, : nv[i]]
            area = poly_area_np(ring)
            for topo in (self.ISLAND, self.TOPO1):
                inter = sum(
                    poly_area_np(p)
                    for p in host_clip.intersect(
                        ring, np.asarray(topo, float)
                    )
                )
                # the reference's exact GEOS booleans give < 1e-6 absolute;
                # our degeneracy-perturbation retry leaves O(delta *
                # perimeter) slivers - bound relatively instead
                assert inter < 1e-5 * area + 1e-6, (i, inter, area)
        return len(act)

    def test_coords_with_topo(self):
        shapes = load_floe_shapes(max_verts=30)[:10]
        fs = FloeSettings(
            min_floe_area=10.0,
            subfloe_point_generator=SubGridPointsGenerator(1e9),
        )
        floes = initialize_floe_field_coords(
            shapes, self._domain(), 0.5, 0.1, fs,
            rng=np.random.default_rng(0),
        )
        assert self._no_topo_overlap(floes) > 0

    def test_voronoi_with_topo_concentration(self):
        # 25 floes at concentration 0.5: total floe area / open-water area
        # within 0.1 of the target (test_floe.jl:160-183)
        fs = FloeSettings(
            min_floe_area=1e4,
            subfloe_point_generator=SubGridPointsGenerator(1e9),
        )
        dom = self._domain()
        floes = initialize_floe_field(
            25, [0.5], dom, 0.5, 0.1, fs, rng=np.random.default_rng(1),
            dtype=jnp.float64,
        )
        n = self._no_topo_overlap(floes)
        assert n > 0
        act = np.asarray(floes.active)
        open_area = 1.6e5 * 1.6e5 - sum(
            abs(poly_area_np(np.asarray(t, float)))
            for t in (self.ISLAND, self.TOPO1)
        )
        conc = float(np.asarray(floes.area)[act].sum()) / open_area
        assert np.isclose(conc, 0.5, atol=0.1)
        ids = np.sort(np.asarray(floes.id)[act])
        assert (ids == np.arange(1, n + 1)).all()

    def test_voronoi_concentration_matrix(self):
        # concentrations [[1, 0.3], [0, 0.5]]: per-cell floe-area fraction
        # stays within [c - eps, 1] (test_floe.jl:185-216)
        fs = FloeSettings(
            min_floe_area=1e4,
            subfloe_point_generator=SubGridPointsGenerator(1e9),
        )
        dom = self._domain()
        conc = np.array([[1.0, 0.3], [0.0, 0.5]])
        floes = initialize_floe_field(
            25, conc, dom, 0.5, 0.1, fs, rng=np.random.default_rng(2),
            dtype=jnp.float64,
        )
        act = np.nonzero(np.asarray(floes.active))[0]
        verts = np.asarray(floes.verts)
        nv = np.asarray(floes.nverts)
        for j in range(2):
            for i in range(2):
                cell = np.array(
                    [
                        [-8e4 + 8e4 * j, -8e4 + 8e4 * i],
                        [-8e4 + 8e4 * j, 8e4 * i],
                        [8e4 * j, 8e4 * i],
                        [8e4 * j, -8e4 + 8e4 * i],
                    ]
                )
                open_cell = [cell]
                for t in (self.ISLAND, self.TOPO1):
                    open_cell = [
                        q
                        for p in open_cell
                        for q in host_clip.difference(
                            p, np.asarray(t, float)
                        )
                    ]
                open_area = sum(poly_area_np(p) for p in open_cell)
                if open_area <= 0:
                    continue
                in_cell = 0.0
                for k in act:
                    ring = verts[k, : nv[k]]
                    for mask in open_cell:
                        in_cell += sum(
                            poly_area_np(p)
                            for p in host_clip.intersect(ring, mask)
                        )
                frac = in_cell / open_area
                c = conc[i, j]
                # the shrink_frac hairline gap loses a sliver of area vs
                # the reference's flush cells
                assert c - 2e-2 <= frac < 1 + 1e-12, (i, j, frac, c)
