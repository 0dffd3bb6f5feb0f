"""Native (C++) polygon booleans must match the pure-Python implementation
ring-for-ring on realistic shapes, and be substantially faster."""

import time

import numpy as np
import pytest

from subzero_tpu import native
from subzero_tpu.geometry import host_clip
from subzero_tpu.tools.fixtures import load_floe_shapes

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable (no g++?)"
)


def _canon(rings):
    """Canonical form: set of rounded vertex multisets per ring, sorted."""
    out = []
    for r in rings:
        r = np.asarray(r)
        out.append(
            (round(host_clip.poly_area_np(r), 6),
             tuple(sorted(map(tuple, np.round(r, 6)))))
        )
    return sorted(out)


@pytest.fixture(scope="module")
def shape_pairs():
    rings = load_floe_shapes(
        "/root/reference/test/inputs/floe_shapes.jld2", max_verts=40
    )[:14]
    pairs = []
    for k in range(0, 12, 2):
        a = rings[k]
        b = rings[k + 1]
        # force overlap: translate b's centroid onto a's with a small offset
        ca = a.mean(0)
        cb = b.mean(0)
        pairs.append((a, b + (ca - cb) + np.array([137.0, -211.0])))
    # plus clean synthetic cases
    sq = np.array([[0.0, 0.0], [2e4, 0.0], [2e4, 2e4], [0.0, 2e4]])
    tri = np.array([[1e4, 1e4], [3e4, 1e4], [2e4, 3e4]])
    cshape = np.array(
        [[0.0, 0.0], [2e4, 0.0], [2e4, 5e3], [5e3, 5e3], [5e3, 1.5e4],
         [2e4, 1.5e4], [2e4, 2e4], [0.0, 2e4]]
    )
    pairs.append((sq, tri))
    pairs.append((cshape, sq + np.array([1.2e4, 0.0])))
    pairs.append((sq, sq + np.array([3e4, 3e4])))  # disjoint
    pairs.append((sq, sq * 0.25 + np.array([5e3, 5e3])))  # containment
    return pairs


@pytest.mark.parametrize("op", ["and", "or", "diff"])
def test_native_matches_python(shape_pairs, op):
    for a, b in shape_pairs:
        py = host_clip._with_retries_py(a, b, op)
        nat = native.poly_boolean(op, a, b)
        assert nat is not None
        assert _canon(py) == _canon(nat), op


def test_pairwise_intersect_area(shape_pairs):
    V = max(max(len(a), len(b)) for a, b in shape_pairs)
    polys = []
    for a, b in shape_pairs:
        polys.append(a)
        polys.append(b)
    n = len(polys)
    verts = np.zeros((n, V, 2))
    nverts = np.zeros((n,), np.int32)
    for i, p in enumerate(polys):
        verts[i, : len(p)] = p
        nverts[i] = len(p)
    ia = np.arange(0, n, 2, dtype=np.int32)
    ib = np.arange(1, n, 2, dtype=np.int32)
    areas = native.pairwise_intersect_area(verts, nverts, ia, ib)
    assert areas is not None
    for k, (a, b) in enumerate(shape_pairs):
        want = sum(
            host_clip.poly_area_np(r)
            for r in host_clip._with_retries_py(a, b, "and")
        )
        assert areas[k] == pytest.approx(want, rel=1e-9, abs=1e-6)


def test_native_is_faster():
    """The C++ kernel should beat the pure-Python inner loops by a wide
    margin on realistic shapes (this is why it exists)."""
    rings = load_floe_shapes(
        "/root/reference/test/inputs/floe_shapes.jld2", max_verts=40
    )[:8]
    a = rings[2]
    b = rings[3] + (a.mean(0) - rings[3].mean(0)) + np.array([97.0, -61.0])
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        host_clip._with_retries_py(a, b, "and")
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        native.poly_boolean("and", a, b)
    t_nat = time.perf_counter() - t0
    assert t_nat < t_py / 5, (t_py, t_nat)
