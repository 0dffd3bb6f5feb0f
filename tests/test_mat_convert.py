"""MATLAB SubZero .mat interchange (tools/mat_convert.py), replacing the
reference's partially-broken file_convert.jl (:21-99)."""

import numpy as np
import jax.numpy as jnp
from scipy.io import loadmat, savemat

from subzero_tpu.core.floes import build_floes
from subzero_tpu.settings import FloeSettings, SubGridPointsGenerator
from subzero_tpu.tools.mat_convert import floes_to_mat, matfloes_to_floes

FS = FloeSettings(
    min_floe_area=1e5, subfloe_point_generator=SubGridPointsGenerator(2e3)
)


def _mat_floe(cx, cy, size, h, u, v, ksi):
    half = size / 2
    body = np.asarray(
        [[-half, half, half, -half], [-half, -half, half, half]], float
    )
    return {
        "c_alpha": body,
        "Xi": cx, "Yi": cy, "h": h,
        "Ui": u, "Vi": v, "ksi_ice": ksi, "alpha_i": 0.1,
    }


def test_matfloes_to_floes(tmp_path):
    """A MATLAB 'floe' struct array loads into a padded pool with world
    rings (c_alpha + centroid), exact heights and kinematics
    (matfloe2julfloes semantics, file_convert.jl:21-52)."""
    path = str(tmp_path / "floes.mat")
    savemat(
        path,
        {"floe": np.asarray(
            [_mat_floe(1e4, 2e4, 5e3, 0.5, 0.1, -0.2, 1e-5),
             _mat_floe(4e4, 2e4, 8e3, 0.3, 0.0, 0.05, 0.0)],
            dtype=object,
        )},
    )
    floes = matfloes_to_floes(path, FS, dtype=jnp.float64)
    act = np.asarray(floes.active)
    assert act.sum() == 2
    rows = np.flatnonzero(act)
    np.testing.assert_allclose(
        np.asarray(floes.centroid)[rows],
        [[1e4, 2e4], [4e4, 2e4]], atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(floes.height)[rows], [0.5, 0.3], rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(floes.area)[rows], [5e3**2, 8e3**2], rtol=1e-9
    )
    np.testing.assert_allclose(np.asarray(floes.u)[rows], [0.1, 0.0])
    np.testing.assert_allclose(np.asarray(floes.v)[rows], [-0.2, 0.05])
    np.testing.assert_allclose(np.asarray(floes.xi)[rows], [1e-5, 0.0])
    # mass consistent with the exact height
    np.testing.assert_allclose(
        np.asarray(floes.mass)[rows],
        np.asarray(floes.area)[rows] * [0.5, 0.3] * FS.rho_i,
        rtol=1e-9,
    )


def test_floes_to_mat_roundtrip(tmp_path):
    """floes_to_mat writes julfloe2matfloe's field layout
    (file_convert.jl:77-99) and the geometry/kinematics survive a
    read-back."""
    sq1 = [[0.0, 0.0], [6e3, 0.0], [6e3, 6e3], [0.0, 6e3]]
    sq2 = [[1e4, 0.0], [1.8e4, 0.0], [1.8e4, 8e3], [1e4, 8e3]]
    floes = build_floes(
        [sq1, sq2], 0.4, 0.0, FS, np.random.default_rng(0),
        dtype=jnp.float64, N=4, u=0.3, v=-0.1,
    )
    path = str(tmp_path / "out.mat")
    floes_to_mat(floes, path)
    back = loadmat(path, squeeze_me=True)
    assert len(back["xcoords"]) == 2
    np.testing.assert_allclose(np.asarray(back["u"]), [0.3, 0.3])
    np.testing.assert_allclose(np.asarray(back["v"]), [-0.1, -0.1])
    ring0x = np.asarray(back["xcoords"][0]).reshape(-1)
    assert ring0x.min() == 0.0 and ring0x.max() == 6e3
    assert back["stress"].shape == (2, 2, 2)
