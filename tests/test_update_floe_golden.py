"""Golden-number update_floe tests from the reference fixture suite.

Ports /root/reference/test/test_physical_processes/test_update_floe.jl using
the previously-unused fixture /root/reference/test/inputs/stress_strain.jld2:
stress_instant (via the production contact-accumulation path), strain,
replace_floe!, conserve_momentum_change_floe_shape! (single + combining),
and update_new_rotation_conserve!.
"""

import h5py
import numpy as np
import jax.numpy as jnp
import pytest

from subzero_tpu.core.floes import build_floes
from subzero_tpu.physics import lifecycle_host as lh
from subzero_tpu.physics import update_floe as uf
from subzero_tpu.physics.collisions import _accumulate_contacts, _PairSides
from subzero_tpu.settings import FloeSettings, SubGridPointsGenerator
from subzero_tpu.tools.conservation import floe_energy_momentum

FIX = "/root/reference/test/inputs/stress_strain.jld2"
FSET = FloeSettings(
    min_floe_area=0.0, subfloe_point_generator=SubGridPointsGenerator(1e9)
)

# golden numbers from test_update_floe.jl:8-13 (column-major vec order)
STRESS_INSTANT = [
    np.array([[-4971.252, 17483.052], [17483.052, -57097.458]]),
    np.array([[4028.520, 9502.886], [9502.886, -205199.791]]),
]
STRAINS = [
    np.array([[-0.0372, 0.0], [0.0, 0.9310]]) * 1e-6,
    np.array([[7.419, 0.0], [0.0, -6.987]]) * 1e-6,
]


def _deref(f, o):
    o = f[o][()]
    if isinstance(o, np.ndarray) and o.dtype == object:
        return [_deref(f, r) for r in o.ravel()]
    return np.asarray(o)


@pytest.fixture(scope="module")
def fix():
    out = {}
    with h5py.File(FIX, "r") as f:
        for k in ("area", "height", "u", "v", "ξ"):
            out[k] = np.asarray(f[k][()])
        out["coords"] = []
        for ref in f["coords"][()]:
            rings = _deref(f, ref)
            ring = np.asarray(rings[0])
            ring = np.squeeze(ring)
            if np.allclose(ring[0], ring[-1]):
                ring = ring[:-1]
            out["coords"].append(ring)
        # interactions stored column-major: [7, n] -> n rows of
        # [floeidx, fx, fy, px, py, torque, overlap]
        out["interactions"] = [
            np.asarray(f[ref][()]).T for ref in f["interactions"][()]
        ]
        out["centroid"] = [np.asarray(f[ref][()]) for ref in f["centroid"][()]]
    return out


def _pool(fix, i):
    floes = build_floes(
        [fix["coords"][i]], float(fix["height"][i]), 0.0, FSET,
        N=4, dtype=jnp.float64,
        u=float(fix["u"][i]), v=float(fix["v"][i]), xi=float(fix["ξ"][i]),
    )
    return floes


def test_stress_instant_golden(fix):
    """calc_stress! stress history values (test_update_floe.jl:28-33),
    computed through the production contact accumulation (stress moments /
    (area * height))."""
    for i in range(2):
        floes = _pool(fix, i)
        assert np.allclose(
            np.asarray(floes.centroid[0]), fix["centroid"][i], atol=1e-6
        )
        inter = fix["interactions"][i]
        K = len(inter)
        force = jnp.asarray(inter[:, 1:3])[:, None, :]      # [K, 1, 2]
        fp = jnp.asarray(inter[:, 3:5])[:, None, :]          # [K, 1, 2]
        ov = jnp.asarray(inter[:, 6])[:, None]               # [K, 1]
        ii = jnp.zeros((K,), jnp.int32)
        jj = jnp.full((K,), 1, jnp.int32)
        zk = jnp.zeros((K,), jnp.float64)
        sides = _PairSides(
            area_i=zk, h_i=zk, nv_i=zk, cent_i=floes.centroid[ii],
            u_i=zk, v_i=zk, xi_i=zk, rmax_i=zk,
            n_j=zk, u_j=zk, v_j=zk, xi_j=zk,
            cent_j=jnp.zeros((K, 2), jnp.float64),
            h_j=zk, area_j=zk, rmax_j=zk,
            is_floe_j=jnp.zeros((K,), bool),
            wall_id_j=jj - floes.capacity,
        )
        col_force, col_trq, sm, overarea = _accumulate_contacts(
            floes.capacity,
            ii, jj, sides,
            jnp.ones((K,), bool),
            jnp.zeros((K,), bool),           # no floe reactions
            jnp.zeros((K, 2), jnp.float64),
            force, fp, ov,
        )
        stress = np.asarray(sm)[0] / (
            float(fix["area"][i]) * float(fix["height"][i])
        )
        np.testing.assert_allclose(stress, STRESS_INSTANT[i], atol=1e-3)
        # the fixture's torque column is the reference's calc_torque! output
        np.testing.assert_allclose(
            float(col_trq[0]), inter[:, 5].sum(), rtol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(col_force)[0], inter[:, 1:3].sum(axis=0), rtol=1e-12
        )
        np.testing.assert_allclose(
            float(overarea[0]), inter[:, 6].sum(), rtol=1e-12
        )


def test_strain_golden(fix):
    """calc_strain! goldens (test_update_floe.jl:13, 35-40), including the
    v := u quirk."""
    for i in range(2):
        floes = _pool(fix, i)
        out = uf.calc_strain(floes)
        np.testing.assert_allclose(
            np.asarray(out.strain)[0], STRAINS[i], atol=1e-9
        )
        # coords untouched
        np.testing.assert_array_equal(
            np.asarray(out.verts), np.asarray(floes.verts)
        )


def test_replace_floe():
    """replace_floe! (test_update_floe.jl:42-77): square replaced by a
    triangle keeps mass; area/centroid/height/rmax recomputed; alpha reset."""
    square = [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]]
    tri = [[0.0, 0.0], [10.0, 10.0], [0.0, 10.0]]
    floes = build_floes([square], 0.5, 0.0, FSET, N=4, dtype=jnp.float64)
    hf = lh.HostFloes(floes)
    mass1 = float(hf.mass[0])
    rng = np.random.default_rng(1)
    hf.replace_floe(0, np.asarray(tri), mass1, FSET, rng)
    f = hf.fields
    assert f["area"][0] == pytest.approx(50.0)
    np.testing.assert_allclose(f["centroid"][0], [10.0 / 3, 20.0 / 3])
    assert f["mass"][0] == mass1
    assert f["height"][0] * f["area"][0] * 920.0 == pytest.approx(mass1)
    assert f["alpha"][0] == 0.0
    assert not f["remove"][0]
    assert f["rmax"][0] == pytest.approx(10 * np.sqrt(5) / 3)


SQUARE20 = [[0.0, 0.0], [20.0, 0.0], [20.0, 20.0], [0.0, 20.0]]
TRI20 = [[0.0, 0.0], [20.0, 0.0], [10.0, 20.0]]


def _momenta(hf, idx):
    f = hf.fields
    px = sum(f["mass"][i] * f["u"][i] for i in idx)
    py = sum(f["mass"][i] * f["v"][i] for i in idx)
    spin = sum(f["moment"][i] * f["xi"][i] for i in idx)
    orb = sum(
        f["mass"][i]
        * (f["centroid"][i][0] * f["v"][i] - f["centroid"][i][1] * f["u"][i])
        for i in idx
    )
    p_px = sum(f["mass"][i] * f["p_dxdt"][i] for i in idx)
    p_py = sum(f["mass"][i] * f["p_dydt"][i] for i in idx)
    p_spin = sum(f["moment"][i] * f["p_dalphadt"][i] for i in idx)
    p_orb = sum(
        f["mass"][i]
        * (
            (f["centroid"][i][0] - 10 * f["p_dxdt"][i]) * f["p_dydt"][i]
            - (f["centroid"][i][1] - 10 * f["p_dydt"][i]) * f["p_dxdt"][i]
        )
        for i in idx
    )
    return np.array([px, py, spin + orb, p_px, p_py, p_spin + p_orb])


def test_conserve_momentum_change_floe_shape():
    """One floe changing shape (test_update_floe.jl:78-192)."""
    floes = build_floes(
        [SQUARE20], 0.5, 0.0, FSET, N=4, dtype=jnp.float64,
        u=0.1, v=0.25, xi=-0.5,
    )
    hf = lh.HostFloes(floes)
    f = hf.fields
    f["p_dxdt"][0] = 0.11
    f["p_dydt"][0] = 0.22
    f["p_dalphadt"][0] = -0.45
    before = _momenta(hf, [0])
    mass_tmp = float(f["mass"][0])
    moment_tmp = float(f["moment"][0])
    x_tmp, y_tmp = f["centroid"][0]
    hf.replace_floe(0, np.asarray(TRI20), mass_tmp, FSET, np.random.default_rng(1))
    lh.conserve_momentum_change_floe_shape(
        mass_tmp, moment_tmp, x_tmp, y_tmp, 10, hf, 0
    )
    after = _momenta(hf, [0])
    np.testing.assert_allclose(before, after, atol=1e-8)


def test_conserve_momentum_two_floes_combine():
    """Two floes combining (test_update_floe.jl:194-308)."""
    tri_shift = np.asarray(TRI20) + np.asarray([10.0, 0.0])
    floes = build_floes(
        [SQUARE20, tri_shift.tolist()], 0.5, 0.0, FSET, N=4,
        dtype=jnp.float64,
    )
    hf = lh.HostFloes(floes)
    f = hf.fields
    f["u"][0], f["v"][0], f["xi"][0] = 0.1, 0.25, -0.5
    f["p_dxdt"][0], f["p_dydt"][0], f["p_dalphadt"][0] = 0.11, 0.22, -0.45
    f["u"][1], f["v"][1], f["xi"][1] = 0.3, 0.05, 0.2
    f["p_dxdt"][1], f["p_dydt"][1], f["p_dalphadt"][1] = 0.2, 0.04, 0.19
    before = _momenta(hf, [0, 1])
    mass1 = float(f["mass"][0])
    moment1 = float(f["moment"][0])
    x1, y1 = f["centroid"][0]
    from subzero_tpu.geometry import host_clip

    union = host_clip.union(np.asarray(SQUARE20), tri_shift)[0]
    hf.replace_floe(
        0, union, mass1 + float(f["mass"][1]), FSET, np.random.default_rng(1)
    )
    lh.conserve_momentum_change_floe_shape(
        mass1, moment1, x1, y1, 10, hf, 0, combine=1
    )
    after = _momenta(hf, [0])
    np.testing.assert_allclose(before, after, atol=1e-8)


def test_update_new_rotation_conserve():
    """update_new_rotation_conserve! (update_floe.jl:205-233): resulting
    spin momenta satisfy the conservation identity and the shared point has
    matching tangential speeds."""
    sq2 = [[20.0, 0.0], [30.0, 0.0], [30.0, 10.0], [20.0, 10.0]]
    floes = build_floes(
        [SQUARE20, sq2], 0.5, 0.0, FSET, N=4, dtype=jnp.float64,
    )
    hf = lh.HostFloes(floes)
    f = hf.fields
    x, y = 20.0, 5.0  # midpoint of the shared edge
    init_rot = 1000.0
    init_p_rot = 500.0
    diff_orb = -200.0
    diff_p_orb = 80.0
    lh.update_new_rotation_conserve(
        hf, 0, 1, x, y, init_rot, init_p_rot, diff_orb, diff_p_orb, 10
    )
    r1 = np.hypot(f["centroid"][0][0] - x, f["centroid"][0][1] - y)
    r2 = np.hypot(f["centroid"][1][0] - x, f["centroid"][1][1] - y)
    # spin momentum identity: xi1*I1 + xi2*I2 == init_rot + diff_orb
    got = f["xi"][0] * f["moment"][0] + f["xi"][1] * f["moment"][1]
    assert got == pytest.approx(init_rot + diff_orb)
    gotp = (
        f["p_dalphadt"][0] * f["moment"][0]
        + f["p_dalphadt"][1] * f["moment"][1]
    )
    assert gotp == pytest.approx(init_p_rot + diff_p_orb)
    # stationary shared point: equal tangential speeds (opposite spins)
    assert f["xi"][0] * r1 == pytest.approx(-f["xi"][1] * r2)
    assert f["p_dxidt"][0] == pytest.approx(
        (f["xi"][0] - f["p_dalphadt"][0]) / 10
    )
