"""Welding golden tests.

Ports the "Weld floes" testset of
/root/reference/test/test_physical_processes/test_welding.jl:127-311: the
multi-scale bin schedule, the area window gates, weld-by-largest-overlap
order, deferred id assignment, and mass-conserving height growth.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from subzero_tpu.core import BoundaryKind, make_domain, make_grid
from subzero_tpu.core.floes import build_floes
from subzero_tpu.physics import lifecycle_host as lh
from subzero_tpu.settings import (
    FloeSettings,
    SubGridPointsGenerator,
    WeldSettings,
)

FSET = FloeSettings(
    min_floe_area=0.0, subfloe_point_generator=SubGridPointsGenerator(1e9)
)
GRID = make_grid(0.0, 1e5, 0.0, 1e5, dx=1e4, dy=1e4)
DOMAIN = make_domain(GRID, *([BoundaryKind.OPEN] * 4), dtype=jnp.float64)

COORDS = [
    [[0.0, 0.0], [6e4, 0.0], [6e4, 5e4], [0.0, 5e4]],
    [[4e4, 0.0], [1e5, 0.0], [1e5, 5e4], [4e4, 5e4]],
    [[2e4, 4e4], [3e4, 4e4], [3e4, 8e4], [2e4, 8e4]],
]
WELD = WeldSettings(
    weld_on=True,
    dts=[700, 250, 100],
    nxs=[1, 2, 1],
    nys=[2, 2, 1],
    max_weld_area=1e10,
    welding_coeff=1000.0,
)


def _base():
    floes = build_floes(COORDS, 1.0, 0.0, FSET, N=8, dtype=jnp.float64)
    return floes._replace(
        id=jnp.asarray([1, 2, 3, 0, 0, 0, 0, 0], floes.id.dtype)
    )


def _weld(floes, ws, idx):
    return lh.timestep_welding(
        floes, int(jnp.max(floes.id)), GRID, DOMAIN, ws, FSET, idx, 10,
        np.random.default_rng(1),
    )


def test_no_weld_across_bins():
    """Nx=2, Ny=2 puts all centroids in different bins -> nothing welds."""
    floes = _base()
    a = np.asarray(floes.area).copy()
    out, max_id = _weld(floes, WELD, 1)
    assert max_id == 3
    assert np.asarray(out.active)[:3].all()
    np.testing.assert_array_equal(np.asarray(out.area)[:3], a[:3])


def test_weld_two_in_same_bin():
    """Nx=1, Ny=2: floes 1+2 share a bin and weld to area 5e9; floe 3 is in
    the other bin and survives untouched."""
    floes = _base()
    a3 = float(floes.area[2])
    h3 = float(floes.height[2])
    out, max_id = _weld(floes, WELD, 0)
    f = np.asarray
    assert max_id == 4
    assert f(out.active)[0] and f(out.active)[2] and not f(out.active)[1]
    assert float(out.area[0]) == pytest.approx(5e9, rel=1e-8)
    assert float(out.area[2]) == a3
    assert float(out.height[0]) == pytest.approx(1.2, rel=1e-8)  # mass conserved
    assert float(out.height[2]) == h3
    assert int(out.id[0]) == 4
    assert int(out.parent_id[0]) == 1


def test_weld_all_three():
    """Nx=1, Ny=1: all three floes weld into one of area 5.3e9 with a single
    new id."""
    floes = _base()
    out, max_id = _weld(floes, WELD, 2)
    f = np.asarray
    assert max_id == 4
    assert f(out.active)[0] and not f(out.active)[1] and not f(out.active)[2]
    assert float(out.area[0]) == pytest.approx(5.3e9, rel=1e-8)
    assert float(out.height[0]) > 1.0
    assert int(out.id[0]) == 4


def test_all_too_big_to_weld():
    floes = _base()
    a = np.asarray(floes.area).copy()
    ws = WeldSettings(
        weld_on=True, dts=[100], nxs=[1], nys=[1],
        max_weld_area=2.0e9, welding_coeff=1000.0,
    )
    out, max_id = _weld(floes, ws, 0)
    assert max_id == 3
    assert np.asarray(out.active)[:3].all()
    np.testing.assert_array_equal(np.asarray(out.area)[:3], a[:3])


def test_all_too_small_to_weld():
    floes = _base()
    a = np.asarray(floes.area).copy()
    ws = WeldSettings(
        weld_on=True, dts=[100], nxs=[1], nys=[1],
        min_weld_area=1e10, welding_coeff=1000.0,
    )
    out, max_id = _weld(floes, ws, 0)
    assert max_id == 3
    assert np.asarray(out.active)[:3].all()
    np.testing.assert_array_equal(np.asarray(out.area)[:3], a[:3])


def test_weld_only_largest_interaction():
    """max_weld_area = 5.1e9: floe 1 welds its largest-overlap partner
    (floe 2, area -> 5e9), then stops because adding floe 3 would exceed
    the cap."""
    floes = _base()
    a3 = float(floes.area[2])
    ws = WeldSettings(
        weld_on=True, dts=[100], nxs=[1], nys=[1],
        max_weld_area=5.1e9, welding_coeff=1000.0,
    )
    out, max_id = _weld(floes, ws, 0)
    f = np.asarray
    assert max_id == 4
    assert f(out.active)[0] and f(out.active)[2] and not f(out.active)[1]
    assert float(out.area[0]) == pytest.approx(5e9, rel=1e-8)
    assert float(out.area[2]) == a3
    assert float(out.height[0]) > 1.0
