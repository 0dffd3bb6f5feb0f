"""Simplification golden tests.

Ports /root/reference/test/test_physical_processes/test_simplification.jl:
dissolve cell placement (incl. periodic wrap + out-of-bounds discard), fuse
mechanics (area/mass/momentum/parent ids/stress merge), smoothing on the
realistic fixture shapes (vertex reduction, conservation, no energy gain),
and the remove/dissolve pool pass.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from subzero_tpu.core import BoundaryKind, make_domain, make_grid, make_ocean
from subzero_tpu.core.floes import build_floes
from subzero_tpu.physics import lifecycle_host as lh
from subzero_tpu.physics.simplification import remove_and_dissolve
from subzero_tpu.settings import (
    FloeSettings,
    SimplificationSettings,
    SubGridPointsGenerator,
)
from subzero_tpu.tools.fixtures import load_floe_shapes

FSET = FloeSettings(
    min_floe_area=0.0, subfloe_point_generator=SubGridPointsGenerator(1e9)
)
RECT = [[0.0, 5e4], [3e4, 5e4], [3e4, 8e4], [0.0, 8e4]]


def _dissolve_grid():
    grid = make_grid(-1e5, 1e5, 0.0, 1e5, dx=1e4, dy=1e4)
    domain = make_domain(
        grid,
        BoundaryKind.COLLISION, BoundaryKind.COLLISION,
        BoundaryKind.PERIODIC, BoundaryKind.PERIODIC,
        dtype=jnp.float64,
    )
    ocean = make_ocean(grid, u=0.0, v=0.0, temp=0.0, dtype=jnp.float64)
    return grid, domain, ocean


@pytest.mark.parametrize(
    "shift,cell",
    [
        ((0.0, 0.0), (11, 6)),        # reference dissolved[7, 12] (1-based y,x)
        ((2.5e3, 2.5e3), (11, 6)),
        ((9e4, 0.0), (0, 6)),         # wraps east -> dissolved[7, 1]
        ((-1.2e5, 0.0), (19, 6)),     # wraps west -> dissolved[7, 20]
    ],
)
def test_dissolve_cell_placement(shift, cell):
    """dissolve_floe! cell indexing (test_simplification.jl:4-37)."""
    grid, domain, ocean = _dissolve_grid()
    ring = (np.asarray(RECT) + np.asarray(shift)).tolist()
    floes = build_floes([ring], 0.25, 0.0, FSET, N=4, dtype=jnp.float64)
    mass = float(floes.mass[0])
    assert mass == pytest.approx(9e8 * 0.25 * 920.0)
    # force dissolution via the min-area gate
    fs = FloeSettings(
        min_floe_area=1e12, subfloe_point_generator=SubGridPointsGenerator(1e9)
    )
    floes2, ocean2 = remove_and_dissolve(floes, ocean, grid, domain, fs)
    d = np.asarray(ocean2.dissolved)
    assert d[cell] == pytest.approx(mass)
    assert d.sum() == pytest.approx(mass)
    assert int(floes2.count()) == 0


@pytest.mark.parametrize("shift", [(0.0, 6e4), (0.0, -7e4)])
def test_dissolve_out_of_bounds_discarded(shift):
    """Mass leaving through a non-periodic direction is not added
    (test_simplification.jl:38-43)."""
    grid, domain, ocean = _dissolve_grid()
    ring = (np.asarray(RECT) + np.asarray(shift)).tolist()
    floes = build_floes([ring], 0.25, 0.0, FSET, N=4, dtype=jnp.float64)
    fs = FloeSettings(
        min_floe_area=1e12, subfloe_point_generator=SubGridPointsGenerator(1e9)
    )
    floes2, ocean2 = remove_and_dissolve(floes, ocean, grid, domain, fs)
    assert np.asarray(ocean2.dissolved).sum() == 0.0
    assert int(floes2.count()) == 0


SQUARE10 = [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]]


def _momenta(hf, idx, dt=10.0):
    f = hf.fields
    out = np.zeros(6)
    for i in idx:
        m, I = f["mass"][i], f["moment"][i]
        cx, cy = f["centroid"][i]
        out[0] += m * f["u"][i]
        out[1] += m * f["v"][i]
        out[2] += I * f["xi"][i] + m * (cx * f["v"][i] - cy * f["u"][i])
        px = cx - dt * f["p_dxdt"][i]
        py = cy - dt * f["p_dydt"][i]
        out[3] += m * f["p_dxdt"][i]
        out[4] += m * f["p_dydt"][i]
        out[5] += I * f["p_dalphadt"][i] + m * (
            px * f["p_dydt"][i] - py * f["p_dxdt"][i]
        )
    return out


def test_fuse_two_floes_golden():
    """fuse_two_floes! (test_simplification.jl:46-183): fused area 170,
    mass/momentum conserved, parent id recorded, stress merged
    mass-weighted."""
    sq2 = (np.asarray(SQUARE10) + np.asarray([7.0, 0.0])).tolist()
    floes = build_floes([SQUARE10], 0.5, 0.0, FSET, N=4, dtype=jnp.float64)
    hf = lh.HostFloes(floes)
    rng = np.random.default_rng(1)
    hf.add_floe(np.asarray(sq2), FSET, rng, height=0.75)
    f = hf.fields
    f["height"][1] = 0.75
    f["mass"][1] = f["area"][1] * 0.75 * 920.0
    f["id"][0], f["id"][1] = 1, 2
    f["u"][0], f["v"][0], f["xi"][0] = 0.1, 0.1, 0.1
    f["p_dxdt"][0], f["p_dydt"][0], f["p_dalphadt"][0] = 0.002, 0.08, 0.04
    f["u"][1], f["v"][1], f["xi"][1] = 0.1, 0.2, 0.0
    s1 = np.array([[10.0, 2.0], [2.0, -5.0]])
    s2 = np.array([[-4.0, 1.0], [1.0, 8.0]])
    f["stress_accum"][0] = s1
    f["stress_accum"][1] = s2
    m1, m2 = float(f["mass"][0]), float(f["mass"][1])
    before = _momenta(hf, [0, 1])
    ok = lh.fuse_two_floes(hf, 0, 1, 10, FSET, prefuse_max_id=2, rng=rng)
    assert ok
    assert f["area"][0] == pytest.approx(170.0)
    assert f["mass"][0] == pytest.approx(m1 + m2)
    assert not f["active"][1] and f["remove"][1]
    assert f["parent_id"][0] == 1
    after = _momenta(hf, [0])
    np.testing.assert_allclose(before, after, atol=1e-8)
    np.testing.assert_allclose(
        f["stress_accum"][0], (s1 * m1 + s2 * m2) / (m1 + m2)
    )


def test_fuse_keeps_larger():
    """The larger floe is kept (test_simplification.jl:185-204)."""
    big = (np.asarray(SQUARE10) * 2.0).tolist()  # 20x20 overlapping square
    floes = build_floes([SQUARE10, big], 0.5, 0.0, FSET, N=4, dtype=jnp.float64)
    floes = floes._replace(
        fuse_with=jnp.asarray([1, -1, -1, -1], jnp.int32),
        id=jnp.asarray([1, 2, 0, 0], floes.id.dtype),
    )
    out, max_id = lh.fuse_floes(floes, 2, FSET, 10, np.random.default_rng(1))
    assert max_id == 3
    act = np.asarray(out.active)
    assert act[1] and not act[0]  # larger floe (slot 1) survives
    assert int(out.id[1]) == 3


def test_smooth_floes_fixture_shapes():
    """smooth_floes! on realistic shapes (test_simplification.jl:283-412):
    vertex counts reduced only above max_vertices; mass conserved; momentum
    conserved; kinetic energy not gained."""
    rings = load_floe_shapes("/root/reference/test/inputs/floe_shapes.jld2")[2:20]
    floes = build_floes(
        rings, 0.5, 0.0, FSET, N=24, V=256, dtype=jnp.float64,
        u=0.05, v=-0.03, xi=1e-5,
    )
    n0 = np.asarray(floes.nverts).copy()
    act = np.asarray(floes.active)
    hf0 = lh.HostFloes(floes)
    before = _momenta(hf0, np.nonzero(act)[0])
    mass0 = float(np.asarray(floes.mass)[act].sum())
    ke0 = float(
        (0.5 * np.asarray(floes.mass) * (np.asarray(floes.u) ** 2 + np.asarray(floes.v) ** 2))[act].sum()
        + (0.5 * np.asarray(floes.moment) * np.asarray(floes.xi) ** 2)[act].sum()
    )
    simp = SimplificationSettings(max_vertices=50)
    out = lh.smooth_floes(floes, simp, FSET, 10, np.random.default_rng(1))
    n1 = np.asarray(out.nverts)
    for i in np.nonzero(act)[0]:
        if n0[i] > 50:
            assert n1[i] < n0[i]
        else:
            assert n1[i] == n0[i]
    assert float(np.asarray(out.mass)[act].sum()) == pytest.approx(mass0)
    hf1 = lh.HostFloes(out)
    after = _momenta(hf1, np.nonzero(act)[0])
    np.testing.assert_allclose(before, after, rtol=1e-10, atol=1e-6)
    ke1 = float(
        (0.5 * np.asarray(out.mass) * (np.asarray(out.u) ** 2 + np.asarray(out.v) ** 2))[act].sum()
        + (0.5 * np.asarray(out.moment) * np.asarray(out.xi) ** 2)[act].sum()
    )
    assert ke1 - ke0 <= 1e-9 * abs(ke0)


def test_remove_floes_pool():
    """remove_floes! (test_simplification.jl:414-521): removal + dissolution
    of small floes, survivors keep ids."""
    coords1 = [[0.0, 0.0], [1e4, 0.0], [1e4, 1e4], [0.0, 1e4]]
    coords2 = [[8e3, 5e3], [1.2e4, 5e3], [1.2e4, 8e3], [8e3, 8e3]]
    coords3 = [[1.1e4, 0.0], [2.1e4, 0.0], [2.1e4, 1e4], [1.1e4, 1e4]]
    coords4 = [[5e3, -2e3], [8e3, -2e3], [8e3, 3e3], [5e3, 3e3]]
    grid = make_grid(-2.5e4, 1e5, -2.5e4, 1e5, dx=1e4, dy=1e4)
    domain = make_domain(grid, *([BoundaryKind.OPEN] * 4), dtype=jnp.float64)
    ocean = make_ocean(grid, u=0.0, v=0.0, temp=0.0, dtype=jnp.float64)
    floes = build_floes(
        [coords1, coords2, coords3, coords4], 0.5, 0.0, FSET, N=8,
        dtype=jnp.float64,
    )
    floes = floes._replace(
        id=jnp.asarray([1, 2, 3, 4, 0, 0, 0, 0], floes.id.dtype),
        remove=jnp.asarray(
            [True, False, False, False, False, False, False, False]
        ),
    )
    m2 = float(floes.mass[1])
    m4 = float(floes.mass[3])
    fs = FloeSettings(
        min_floe_area=1e8, subfloe_point_generator=SubGridPointsGenerator(1e9)
    )
    out, ocean2 = remove_and_dissolve(floes, ocean, grid, domain, fs)
    act = np.asarray(out.active)
    assert act.sum() == 1
    assert int(np.asarray(out.id)[act][0]) == 3
    assert np.asarray(ocean2.dissolved).sum() == pytest.approx(m2 + m4)
