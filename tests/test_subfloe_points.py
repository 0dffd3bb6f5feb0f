"""Sub-floe point generator tests.

Ports the generator tests of
/root/reference/test/test_physical_processes/test_coupling.jl:3-130:
Monte-Carlo statistical properties (area error < 10%, seeded
reproducibility) on a realistic fixture shape, and SubGrid golden point
sets for small/tall/wide rectangles (compared as sets - the reference's
traversal order is an implementation detail).
"""

import numpy as np
import pytest

from subzero_tpu.core.floes import (
    _point_in_ring_np,
    generate_mc_points,
    generate_subgrid_points,
)
from subzero_tpu.settings import MonteCarloPointsGenerator
from subzero_tpu.tools.fixtures import load_floe_shapes

SQRT2 = np.sqrt(2.0)


@pytest.fixture(scope="module")
def origin_ring():
    ring = load_floe_shapes("/root/reference/test/inputs/floe_shapes.jld2")[0]
    cx = ring.mean(0)  # rough; recentre exactly below
    x, y = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    cr = x * y2 - x2 * y
    a = 0.5 * cr.sum()
    cent = np.array(
        [((x + x2) * cr).sum() / (6 * a), ((y + y2) * cr).sum() / (6 * a)]
    )
    return ring - cent, abs(a)


def test_mc_points_area_error(origin_ring):
    """test_coupling.jl:21-34: points all inside; density estimate of the
    area within 10%."""
    ring, area = origin_ring
    gen = MonteCarloPointsGenerator()
    mx, my = generate_mc_points(ring, area, gen, np.random.default_rng(1))
    assert mx is not None and len(mx) == len(my) > 0
    assert _point_in_ring_np(mx, my, ring).all()
    xmin, ymin = ring.min(0)
    xmax, ymax = ring.max(0)
    est = len(mx) / gen.npoints * (xmax - xmin) * (ymax - ymin)
    assert abs(est - area) / area < 0.1


def test_mc_points_seeded_reproducible(origin_ring):
    """test_coupling.jl:36-46: same seed -> identical points; different
    seed -> different points."""
    ring, area = origin_ring
    gen = MonteCarloPointsGenerator()
    x1, y1 = generate_mc_points(ring, area, gen, np.random.default_rng(1))
    x2, y2 = generate_mc_points(ring, area, gen, np.random.default_rng(1))
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)
    x3, _ = generate_mc_points(ring, area, gen, np.random.default_rng(2))
    assert len(x3) != len(x1) or not np.array_equal(x3, x1)


def _pointset(xs, ys, tol=1e-5):
    return {(round(float(x) / tol) * tol, round(float(y) / tol) * tol)
            for x, y in zip(xs, ys)}


def test_subgrid_points_small_square():
    """test_coupling.jl:62-80: floe smaller than the cell -> vertices +
    centroid."""
    ring = np.array([[-2.5, -2.5], [2.5, -2.5], [2.5, 2.5], [-2.5, 2.5]])
    xs, ys = generate_subgrid_points(ring, 10 / SQRT2)
    assert _pointset(xs, ys) == {
        (-2.5, -2.5), (-2.5, 2.5), (2.5, 2.5), (2.5, -2.5), (0.0, 0.0)
    }


def test_subgrid_points_tall_rect():
    """test_coupling.jl:82-104: long edges get interior points at the
    half-dg-inset lattice; interior column at x=0."""
    ring = np.array([[-2.0, -10.0], [2.0, -10.0], [2.0, 10.0], [-2.0, 10.0]])
    xs, ys = generate_subgrid_points(ring, 10 / SQRT2)
    want_y = [-10.0, -6.46447, 0.0, 6.46447, 10.0]
    want = {(-2.0, y) for y in want_y} | {(2.0, y) for y in want_y} | {
        (0.0, -6.46447), (0.0, 0.0), (0.0, 6.46447)
    }
    got = _pointset(xs, ys)

    def close(a, b):
        return abs(a[0] - b[0]) < 1e-4 and abs(a[1] - b[1]) < 1e-4

    assert len(got) == len(want)
    for w in want:
        assert any(close(w, g) for g in got), w


def test_max_points_thinning():
    """SubGridPointsGenerator.max_points (TPU extension, settings.py):
    oversized floes keep a deterministic proportional subsample whose
    points-mean stays close to the full set's (the coupling force is the
    points-mean times area, coupling.jl:1486-1589)."""
    from subzero_tpu.core.floes import subfloe_points_for_ring
    from subzero_tpu.settings import SubGridPointsGenerator

    ring = np.array(
        [[-1e4, -1e4], [1.3e4, -1.1e4], [1.5e4, 1e4], [-0.5e4, 1.6e4]]
    )
    area = 0.0  # unused for subgrid
    full_gen = SubGridPointsGenerator(707.0)
    fx, fy = subfloe_points_for_ring(ring, area, full_gen, None)
    assert len(fx) > 400
    capped = SubGridPointsGenerator(707.0, max_points=128)
    cx, cy = subfloe_points_for_ring(ring, area, capped, None)
    assert len(cx) == 128
    # deterministic
    cx2, cy2 = subfloe_points_for_ring(ring, area, capped, None)
    np.testing.assert_array_equal(cx, cx2)
    # subsample of the full set
    full_set = _pointset(fx, fy)
    assert _pointset(cx, cy) <= full_set
    # the quadrature mean moves by far less than the floe scale: the mean
    # of a smooth integrand (here the points themselves, the first moment)
    # is preserved to ~1% of rmax by proportional thinning
    rmax = np.sqrt((ring**2).sum(1).max())
    assert abs(cx.mean() - fx.mean()) < 0.02 * rmax
    assert abs(cy.mean() - fy.mean()) < 0.02 * rmax
    # small floes are untouched
    sm = np.array([[-2.5, -2.5], [2.5, -2.5], [2.5, 2.5], [-2.5, 2.5]])
    sx, sy = subfloe_points_for_ring(sm, area, capped, None)
    gx, gy = subfloe_points_for_ring(sm, area, full_gen, None)
    np.testing.assert_array_equal(sx, gx)


def test_subgrid_points_wide_rect():
    """test_coupling.jl:106-130 (transpose of the tall case)."""
    ring = np.array([[-10.0, -2.0], [10.0, -2.0], [10.0, 2.0], [-10.0, 2.0]])
    xs, ys = generate_subgrid_points(ring, 10 / SQRT2)
    want_x = [-10.0, -6.46447, 0.0, 6.46447, 10.0]
    want = {(x, -2.0) for x in want_x} | {(x, 2.0) for x in want_x} | {
        (-6.46447, 0.0), (0.0, 0.0), (6.46447, 0.0)
    }
    got = _pointset(xs, ys)

    def close(a, b):
        return abs(a[0] - b[0]) < 1e-4 and abs(a[1] - b[1]) < 1e-4

    assert len(got) == len(want)
    for w in want:
        assert any(close(w, g) for g in got), w
