"""Geometry kernel tests: primitives + the batched intersection kernel.

Ground truth from hand-computed cases and Monte-Carlo area estimates (no
polygon-boolean library is available in this environment).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from subzero_tpu.geometry import (
    intersect_regions,
    pad_polygon,
    poly_area,
    poly_centroid,
    poly_moment_inertia,
    point_in_polygon,
    max_radius,
    signed_area,
    ensure_ccw,
)

V = 16


def square(x0, y0, s):
    return [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]]


def mc_overlap_area(c1, c2, n=400_000, seed=0):
    """Monte-Carlo intersection area estimate of two polygon coord lists."""
    rng = np.random.default_rng(seed)
    c1 = np.asarray(c1, float)
    c2 = np.asarray(c2, float)
    lo = np.minimum(c1.min(0), c2.min(0))
    hi = np.maximum(c1.max(0), c2.max(0))
    pts = lo + rng.random((n, 2)) * (hi - lo)
    v1, n1 = pad_polygon(c1, 32)
    v2, n2 = pad_polygon(c2, 32)
    in1 = np.asarray(point_in_polygon(jnp.asarray(pts), v1, n1))
    in2 = np.asarray(point_in_polygon(jnp.asarray(pts), v2, n2))
    box = np.prod(hi - lo)
    return (in1 & in2).mean() * box


class TestPrimitives:
    def test_area_centroid_square(self):
        v, n = pad_polygon(square(0, 0, 2), V)
        assert np.isclose(float(poly_area(v, n)), 4.0)
        assert np.allclose(np.asarray(poly_centroid(v, n)), [1.0, 1.0])

    def test_signed_area_ccw(self):
        v, n = pad_polygon(square(0, 0, 2), V)
        assert float(signed_area(v, n)) > 0

    def test_ensure_ccw(self):
        cw = list(reversed(square(0, 0, 2)))
        v, n = pad_polygon(cw, V)
        assert float(signed_area(v, n)) < 0
        v2 = ensure_ccw(v, n)
        assert float(signed_area(v2, n)) > 0
        assert np.isclose(float(poly_area(v2, n)), 4.0)

    def test_moment_inertia_rectangle(self):
        # 4x2 rectangle centered at origin: I = rho*h*(a*b)*(a^2+b^2)/12
        a, b = 4.0, 2.0
        coords = [[-2, -1], [2, -1], [2, 1], [-2, 1]]
        v, n = pad_polygon(coords, V)
        c = poly_centroid(v, n)
        h, rho = 0.5, 920.0
        got = float(poly_moment_inertia(v, n, c, h, rho))
        want = rho * h * (a * b) * (a**2 + b**2) / 12.0
        assert np.isclose(got, want, rtol=1e-12)

    def test_point_in_polygon(self):
        v, n = pad_polygon(square(0, 0, 2), V)
        pts = jnp.asarray([[1.0, 1.0], [3.0, 1.0], [-0.5, 0.5], [1.0, 1.9]])
        got = np.asarray(point_in_polygon(pts, v, n))
        assert got.tolist() == [True, False, False, True]

    def test_max_radius(self):
        v, n = pad_polygon(square(-1, -1, 2), V)
        c = poly_centroid(v, n)
        assert np.isclose(float(max_radius(v, n, c)), np.sqrt(2.0))


class TestIntersect:
    def check(self, c1, c2, want_area, want_regions=None, rtol=1e-9):
        v1, n1 = pad_polygon(c1, V)
        v2, n2 = pad_polygon(c2, V)
        res = intersect_regions(v1, n1, v2, n2)
        assert not bool(res.overflow)
        assert np.isclose(float(res.total_area), want_area, rtol=rtol, atol=1e-12)
        if want_regions is not None:
            assert int(np.sum(np.asarray(res.valid))) == want_regions
        return res

    def test_offset_squares(self):
        res = self.check(square(0, 0, 1), square(0.5, 0.5, 1), 0.25, 1)
        r = int(np.argmax(np.asarray(res.valid)))
        assert np.allclose(np.asarray(res.centroid[r]), [0.75, 0.75])
        assert int(res.n_cross[r]) == 2

    def test_disjoint(self):
        self.check(square(0, 0, 1), square(5, 5, 1), 0.0, 0)

    def test_contained(self):
        res = self.check(square(0, 0, 4), square(1, 1, 1), 1.0, 0)
        # containment: area reported but no force regions (matches reference
        # semantics: no boundary intersection points -> no contact forces)
        assert int(np.sum(np.asarray(res.valid))) == 0

    def test_cross_shape_two_regions(self):
        # tall rectangle x wide rectangle = one region (plus sign overlap)
        tall = [[-0.5, -2], [0.5, -2], [0.5, 2], [-0.5, 2]]
        wide = [[-2, -0.5], [2, -0.5], [2, 0.5], [-2, 0.5]]
        self.check(tall, wide, 1.0, 1)

    def test_c_shape_two_regions(self):
        # C-shaped (non-convex) polygon vs a bar crossing both arms:
        # mirrors the reference golden test topology
        # (test_collisions.jl:64-81).
        cshape = [[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [3, 3], [3, 4], [0, 4]]
        bar = [[2.5, -1], [3.5, -1], [3.5, 5], [2.5, 5]]
        # overlap: with arms y in [0,1] and [3,4], x in [2.5,3]: 2 x 0.5*1
        res = self.check(cshape, bar, 1.0, 2)
        areas = np.sort(np.asarray(res.area)[np.asarray(res.valid)])
        assert np.allclose(areas, [0.5, 0.5])

    def test_triangle_square(self):
        tri = [[0, 0], [2, 0], [1, 2]]
        sq = square(0.1, 0.1, 1)
        v1, n1 = pad_polygon(tri, V)
        v2, n2 = pad_polygon(sq, V)
        res = intersect_regions(v1, n1, v2, n2)
        mc = mc_overlap_area(tri, sq)
        assert np.isclose(float(res.total_area), mc, rtol=2e-2)

    def test_degenerate_shared_edge_perturbed(self):
        # shared vertex + collinear overlapping edges: unresolvable exactly,
        # flagged as overflow; perturbation resolves it approximately.
        tri = [[0, 0], [2, 0], [1, 2]]
        sq = square(0, 0, 1)
        v1, n1 = pad_polygon(tri, V)
        v2, n2 = pad_polygon(sq, V)
        res0 = intersect_regions(v1, n1, v2, n2)
        assert bool(res0.overflow)  # parity violation detected
        res = intersect_regions(v1, n1, v2, n2, perturb=1e-9)
        assert not bool(res.overflow)
        mc = mc_overlap_area(tri, sq)
        assert np.isclose(float(res.total_area), mc, rtol=2e-2)

    def test_random_convex_pairs_vs_mc(self):
        rng = np.random.default_rng(42)
        for trial in range(8):
            # random convex polygons via hull of random points
            from scipy.spatial import ConvexHull

            p1 = rng.random((12, 2)) * 2
            p2 = rng.random((12, 2)) * 2 + rng.random(2)
            h1 = p1[ConvexHull(p1).vertices]
            h2 = p2[ConvexHull(p2).vertices]
            v1, n1 = pad_polygon(h1, V)
            v2, n2 = pad_polygon(h2, V)
            res = intersect_regions(v1, n1, v2, n2)
            mc = mc_overlap_area(h1, h2, seed=trial)
            got = float(res.total_area)
            assert np.isclose(got, mc, rtol=3e-2, atol=2e-3), (trial, got, mc)

    def test_nonconvex_pair_vs_mc(self):
        rng = np.random.default_rng(7)
        # star-like non-convex polygons
        for trial in range(6):
            th = np.sort(rng.random(9) * 2 * np.pi)
            r1 = 0.5 + rng.random(9)
            c1 = np.stack([r1 * np.cos(th), r1 * np.sin(th)], -1)
            th2 = np.sort(rng.random(9) * 2 * np.pi)
            r2 = 0.5 + rng.random(9)
            c2 = np.stack([r2 * np.cos(th2), r2 * np.sin(th2)], -1) + rng.random(2) * 0.8
            v1, n1 = pad_polygon(c1, V)
            v2, n2 = pad_polygon(c2, V)
            res = intersect_regions(v1, n1, v2, n2)
            if bool(res.overflow):
                continue
            mc = mc_overlap_area(c1, c2, seed=100 + trial)
            got = float(res.total_area)
            assert np.isclose(got, mc, rtol=4e-2, atol=5e-3), (trial, got, mc)

    def test_vmapped(self):
        v1, n1 = pad_polygon(square(0, 0, 1), V)
        v2s = []
        n2s = []
        want = []
        for dx in [0.25, 0.5, 0.75, 5.0]:
            v2, n2 = pad_polygon(square(dx, 0.125, 1), V)
            v2s.append(v2)
            n2s.append(n2)
            want.append(max(0.0, 1 - dx) * 0.875)
        v2b = jnp.stack(v2s)
        n2b = jnp.stack(n2s)
        res = jax.vmap(lambda v, n: intersect_regions(v1, n1, v, n))(v2b, n2b)
        assert np.allclose(np.asarray(res.total_area), want)

    def test_collinear_edges_perturbed(self):
        # squares sharing collinear top/bottom edges: exact intersection is
        # degenerate; a tiny perturbation gives the right answer.
        v1, n1 = pad_polygon(square(0, 0, 1), V)
        v2, n2 = pad_polygon(square(0.25, 0.0, 1), V)
        res = intersect_regions(v1, n1, v2, n2, perturb=1e-9)
        assert np.isclose(float(res.total_area), 0.75, atol=1e-6)


class TestClipAreaToRects:
    """_clip_area_to_rects (closed-form clamped-image shoelace) vs the host
    Weiler-Atherton booleans, on random non-convex rings and random rects."""

    def test_random_rings_vs_host_clip(self):
        from subzero_tpu.geometry import host_clip
        from subzero_tpu.geometry.host_clip import poly_area_np
        from subzero_tpu.physics.coupling import _clip_area_to_rects

        rng = np.random.default_rng(7)
        N, VV, A, B = 12, 24, 3, 3
        verts = np.zeros((N, VV, 2))
        nverts = np.zeros((N,), np.int32)
        for i in range(N):
            nv = int(rng.integers(5, VV))
            th = np.sort(rng.random(nv)) * 2 * np.pi
            r = 0.4 + rng.random(nv)  # star-shaped non-convex ring
            ring = np.stack([r * np.cos(th), r * np.sin(th)], axis=1)
            verts[i, :nv] = ring
            verts[i, nv:] = ring[-1]
            nverts[i] = nv
        xmin = rng.uniform(-1.5, 0.5, (N, A, B))
        ymin = rng.uniform(-1.5, 0.5, (N, A, B))
        xmax = xmin + rng.uniform(0.1, 1.5, (N, A, B))
        ymax = ymin + rng.uniform(0.1, 1.5, (N, A, B))
        ok = np.ones((N, A, B), bool)
        got = np.asarray(
            _clip_area_to_rects(
                jnp.asarray(verts), jnp.asarray(nverts),
                jnp.asarray(xmin), jnp.asarray(xmax),
                jnp.asarray(ymin), jnp.asarray(ymax), jnp.asarray(ok),
            )
        )
        for i in range(N):
            ring = verts[i, : nverts[i]]
            for a in range(A):
                for b in range(B):
                    rect = np.array(
                        [
                            [xmin[i, a, b], ymin[i, a, b]],
                            [xmax[i, a, b], ymin[i, a, b]],
                            [xmax[i, a, b], ymax[i, a, b]],
                            [xmin[i, a, b], ymax[i, a, b]],
                        ]
                    )
                    want = sum(
                        poly_area_np(p) for p in host_clip.intersect(ring, rect)
                    )
                    assert np.isclose(got[i, a, b], want, rtol=1e-5, atol=1e-9), (
                        i, a, b, got[i, a, b], want,
                    )
