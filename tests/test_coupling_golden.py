"""OA forcing golden numbers (test_coupling.jl:464-579, "OA Forcings").

Uses the reference's test_mc_points.jld2 fixture - the exact Monte-Carlo
sub-floe points the MATLAB lineage used to produce the golden fxOA/fyOA/
trqOA values - so the drag/Coriolis/turning-angle quadrature is compared
point-for-point.  All six models are ported, including the non-uniform
streamfunction fields of models 5-6 (the Julia tests build [ny, nx]
matrices via grids_from_lines and pass the transpose to Ocean, which is
exactly our x-major [Nx+1, Ny+1] layout).
"""

import h5py
import numpy as np
import jax.numpy as jnp
import pytest

from subzero_tpu.constants import Constants
from subzero_tpu.core import (
    BoundaryKind,
    make_atmos,
    make_domain,
    make_grid,
    make_ocean,
)
from subzero_tpu.core.floes import build_floes
from subzero_tpu.physics.coupling import calc_one_way_coupling
from subzero_tpu.settings import FloeSettings, SubGridPointsGenerator

GRID = make_grid(-1e5, 1e5, -1e5, 1e5, dx=1e4, dy=1e4)
C = BoundaryKind.COLLISION
DOMAIN = make_domain(GRID, C, C, C, C, dtype=jnp.float64)
RECT = [[-1.75e4, 5e4], [-1.25e4, 5e4], [-1.25e4, 7e4], [-1.75e4, 7e4]]
FSET = FloeSettings(
    min_floe_area=0.0, subfloe_point_generator=SubGridPointsGenerator(1e9)
)


def _floe_with_fixture_points(u=0.0, v=0.0):
    with h5py.File("/root/reference/test/inputs/test_mc_points.jld2", "r") as f:
        X = np.asarray(f["X"][()], float).ravel()
        Y = np.asarray(f["Y"][()], float).ravel()
    floes = build_floes(
        [RECT], 0.25, 0.0, FSET, N=2, P=max(1024, len(X)), dtype=jnp.float64,
        u=u, v=v,
    )
    P = floes.max_sub
    sx = np.zeros((2, P))
    sy = np.zeros((2, P))
    sx[0, : len(X)] = X
    sy[0, : len(Y)] = Y
    nsub = np.array(floes.nsub)
    nsub[0] = len(X)
    return floes._replace(
        sub_x=jnp.asarray(sx), sub_y=jnp.asarray(sy),
        nsub=jnp.asarray(nsub),
    )


def _consts():
    area = 4e7  # 0.5e4 x 2e4 rectangle
    modulus = 1.5e3 * (np.sqrt(area) + np.sqrt(area))
    return Constants(E=float(modulus))


def _run(ocean_u, ocean_v, atmos_u=0.0, atmos_v=0.0, u=0.0, v=0.0):
    ocean = make_ocean(GRID, u=ocean_u, v=ocean_v, temp=0.0, dtype=jnp.float64)
    atmos = make_atmos(GRID, u=atmos_u, v=atmos_v, temp=-20.0, dtype=jnp.float64)
    floes = _floe_with_fixture_points(u=u, v=v)
    ow = calc_one_way_coupling(floes, GRID, DOMAIN, ocean, atmos, _consts())
    f = ow.floes
    area = float(f.area[0])
    return (
        float(f.fx_oa[0]) / area,
        float(f.fy_oa[0]) / area,
        float(f.trq_oa[0]) / area,
    )


def test_stationary_floe_zonal_ocean():
    fx, fy, trq = _run(ocean_u=1.0, ocean_v=0.0)
    assert fx == pytest.approx(2.9760, abs=1e-3)
    assert fy == pytest.approx(0.8296, abs=1e-3)
    assert trq == pytest.approx(-523.9212, abs=1e-3)


def test_stationary_floe_meridional_ocean():
    fx, fy, trq = _run(ocean_u=0.0, ocean_v=1.0)
    assert fx == pytest.approx(-0.8296, abs=1e-3)
    assert fy == pytest.approx(2.9760, abs=1e-3)
    assert trq == pytest.approx(239.3141, abs=1e-3)


def test_moving_floe_zero_ocean():
    fx, fy, trq = _run(ocean_u=0.0, ocean_v=0.0, u=0.25, v=0.1)
    assert fx == pytest.approx(-0.1756, abs=1e-3)
    assert fy == pytest.approx(-0.1419, abs=1e-3)
    assert trq == pytest.approx(29.0465, abs=1e-1)


def test_stationary_floe_diagonal_atmos():
    fx, fy, trq = _run(ocean_u=0.0, ocean_v=0.0, atmos_u=-1.0, atmos_v=-0.5)
    assert fx == pytest.approx(-0.0013, abs=1e-3)
    assert fy == pytest.approx(-6.7082e-4, abs=1e-3)
    assert trq == pytest.approx(0.2276, abs=1e-3)


def _non_uniform_fields():
    """The reference's streamfunction-derived non-uniform u/v fields
    (test_coupling.jl:580-593).  grids_from_lines gives [ny, nx] matrices
    (xgrid[iy, ix] = x_ix); the test passes the TRANSPOSE to Ocean, i.e.
    x-major [nx, ny] - exactly our make_ocean convention."""
    xs = np.linspace(-1e5, 1e5, 21)
    X, Y = np.meshgrid(xs, xs)  # indexing='xy': X[iy, ix] = xs[ix]
    psi = 0.5e4 * np.sin(4 * np.pi / 4e5 * X) * np.sin(4 * np.pi / 4e5 * Y)
    u = np.zeros_like(X)
    u[1:, :] = -1e-4 * (psi[1:, :] - psi[:-1, :])
    v = np.zeros_like(Y)
    v[:, 1:] = 1e-4 * (psi[:, 1:] - psi[:, :-1])
    return u.T, v.T


def test_stationary_floe_non_uniform_ocean():
    # model 5 (test_coupling.jl:580-612)
    u, v = _non_uniform_fields()
    fx, fy, trq = _run(ocean_u=u, ocean_v=v)
    assert fx == pytest.approx(-0.0182, abs=1e-3)
    assert fy == pytest.approx(0.0392, abs=1e-3)
    assert trq == pytest.approx(23.6399, abs=1e-3)


def test_moving_floe_non_uniform_ocean_atmos():
    # model 6 (test_coupling.jl:614-640)
    u, v = _non_uniform_fields()
    fx, fy, trq = _run(
        ocean_u=u, ocean_v=v, atmos_u=u, atmos_v=v, u=0.5, v=-0.5
    )
    assert fx == pytest.approx(-1.6300, abs=1e-3)
    assert fy == pytest.approx(1.1240, abs=1e-3)
    assert trq == pytest.approx(523.2361, abs=2e-1)


class TestEulerianOA:
    """Eulerian (grid-cell) OA forcing - the working version of the
    reference's dormant eulerian_OA_code.jl (floe_OA_forcings!, :121-179)."""

    def _square_floe(self, u=0.0, v=0.0):
        sq = [[-1e4, -1e4], [1e4, -1e4], [1e4, 1e4], [-1e4, 1e4]]
        return build_floes(
            [sq], 0.25, 0.0, FSET, np.random.default_rng(0),
            dtype=jnp.float64, N=2, u=u, v=v,
        )

    def test_uniform_ocean_drag_golden(self):
        """Uniform ocean current, floe at rest: the exact-area cell sum
        reduces to the closed-form drag + pressure-gradient expressions
        (eulerian_OA_code.jl:146-155), and the clipped cell areas sum to
        the floe area exactly."""
        from subzero_tpu.physics.coupling import calc_eulerian_oa_coupling

        consts = Constants()
        u0 = 0.2
        ocean = make_ocean(GRID, u=u0, v=0.0, temp=0.0, dtype=jnp.float64)
        atmos = make_atmos(GRID, u=0.0, v=0.0, temp=-1.0, dtype=jnp.float64)
        floes = self._square_floe()
        out = calc_eulerian_oa_coupling(
            floes, GRID, DOMAIN, ocean, atmos, consts, cell_cap=7
        )
        A = float(floes.area[0])
        m = float(floes.mass[0])
        tau = consts.rho_o * consts.Cd_io * u0 * u0
        fx_exp = tau * np.cos(consts.turn_angle) * A
        fy_exp = tau * np.sin(consts.turn_angle) * A + (m / A) * consts.f * u0 * A
        np.testing.assert_allclose(float(out.fx_oa[0]), fx_exp, rtol=1e-9)
        np.testing.assert_allclose(float(out.fy_oa[0]), fy_exp, rtol=1e-9)
        # symmetric square in a uniform field: no torque
        assert abs(float(out.trq_oa[0])) < 1e-6 * abs(fx_exp) * 1e4

    def test_matches_point_coupling_uniform_fields(self):
        """For uniform fields the Eulerian and point-quadrature forcings
        integrate the same constant stress - they must agree closely."""
        from subzero_tpu.physics.coupling import (
            calc_eulerian_oa_coupling,
            calc_one_way_coupling,
        )

        consts = Constants()
        ocean = make_ocean(GRID, u=0.15, v=-0.1, temp=0.0, dtype=jnp.float64)
        atmos = make_atmos(GRID, u=5.0, v=0.0, temp=-1.0, dtype=jnp.float64)
        fs = FloeSettings(
            min_floe_area=0.0,
            subfloe_point_generator=SubGridPointsGenerator(2e3),
        )
        sq = [[-1e4, -1e4], [1e4, -1e4], [1e4, 1e4], [-1e4, 1e4]]
        floes = build_floes(
            [sq], 0.25, 0.0, fs, np.random.default_rng(0),
            dtype=jnp.float64, N=2, u=0.05, v=0.02,
        )
        eu = calc_eulerian_oa_coupling(
            floes, GRID, DOMAIN, ocean, atmos, consts, cell_cap=7
        )
        pt = calc_one_way_coupling(
            floes, GRID, DOMAIN, ocean, atmos, consts
        ).floes
        # atmosphere drag differs by design (raw vs point-relative wind),
        # but at |ua| >> |uice| both reduce to the same quadratic drag;
        # rotation sampling differs (cells vs points) - few-percent match
        np.testing.assert_allclose(
            float(eu.fx_oa[0]), float(pt.fx_oa[0]), rtol=0.05
        )
        np.testing.assert_allclose(
            float(eu.fy_oa[0]), float(pt.fy_oa[0]), rtol=0.05
        )

    def test_timestep_coupling_eulerian_mode(self):
        """CouplingSettings(eulerian=True) routes timestep_coupling through
        the grid-cell path and fills the floe OA fields."""
        from subzero_tpu.physics.coupling import timestep_coupling
        from subzero_tpu.settings import CouplingSettings

        consts = Constants()
        ocean = make_ocean(GRID, u=0.2, v=0.0, temp=0.0, dtype=jnp.float64)
        atmos = make_atmos(GRID, u=0.0, v=0.0, temp=-1.0, dtype=jnp.float64)
        floes = self._square_floe()
        cps = CouplingSettings(eulerian=True)
        out, ocean2, overflow = timestep_coupling(
            floes, GRID, DOMAIN, ocean, atmos, consts, cps, FSET, 10.0,
            cell_cap=7,
        )
        assert float(out.fx_oa[0]) > 0
        assert not bool(overflow)


def test_eulerian_rejects_two_way():
    """CouplingSettings(eulerian=True, two_way_coupling_on=True) must not
    silently desync: eulerian is one-way only (the decomp step's lax.cond
    branches would otherwise emit mismatched collectives)."""
    import warnings as _w

    from subzero_tpu.settings import CouplingSettings

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        cs = CouplingSettings(eulerian=True, two_way_coupling_on=True)
    assert cs.two_way_coupling_on is False
    assert any("one-way" in str(r.message) for r in rec)


@pytest.mark.parametrize("periodic", [True, False])
def test_windowed_interp_matches_bilinear(periodic):
    """The TPU fast-path windowed interpolation (per-floe node window +
    MXU weight stencils) must be semantically identical to the generic
    per-point _bilinear gathers: in f64 the only difference is product
    ordering (~1e-15 rel), so a tight tolerance catches any base-index,
    wrap, or clamp mistake.  Floes sit near the domain edge to exercise
    the periodic wrap / non-periodic clamp of the padded grid."""
    from subzero_tpu.core import initialize_floe_field

    kind = BoundaryKind.PERIODIC if periodic else C
    domain = make_domain(GRID, kind, kind, kind, kind, dtype=jnp.float64)
    fs = FloeSettings(
        min_floe_area=1e6, subfloe_point_generator=SubGridPointsGenerator(4e3)
    )
    floes = initialize_floe_field(
        60, [0.6], domain, 0.25, 0.0, fs, rng=np.random.default_rng(11),
        dtype=jnp.float64, shrink_frac=0.0,
    )
    # non-uniform smooth fields so interpolation values actually vary
    gx = np.linspace(0, 2 * np.pi, GRID.Nx + 1)
    gy = np.linspace(0, 2 * np.pi, GRID.Ny + 1)
    uo = np.sin(gx)[:, None] * np.cos(gy)[None, :] + 0.3
    vo = np.cos(2 * gx)[:, None] * np.sin(gy)[None, :]
    ocean = make_ocean(GRID, u=jnp.asarray(uo), v=jnp.asarray(vo),
                       temp=0.0, dtype=jnp.float64)
    atmos = make_atmos(GRID, u=jnp.asarray(3.0 * vo), v=jnp.asarray(2.0 * uo),
                       temp=-20.0, dtype=jnp.float64)
    consts = _consts()
    gen = calc_one_way_coupling(floes, GRID, domain, ocean, atmos, consts)
    win = calc_one_way_coupling(floes, GRID, domain, ocean, atmos, consts,
                                window=8)
    assert not bool(win.window_ovf)
    act = np.asarray(floes.active)
    for f in ("fx_oa", "fy_oa", "trq_oa", "hflx_factor"):
        a = np.asarray(getattr(gen.floes, f))[act]
        b = np.asarray(getattr(win.floes, f))[act]
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-9, err_msg=f)
    np.testing.assert_allclose(
        np.asarray(gen.pt_tau_x_ocn)[np.asarray(gen.pt_mask)],
        np.asarray(win.pt_tau_x_ocn)[np.asarray(win.pt_mask)],
        rtol=1e-12, atol=1e-12,
    )
