"""MATLAB SubZero .mat <-> FloeState converters.

The reference ships matfloe2julfloes / julfloe2matfloe
(/root/reference/src/tools/file_convert.jl:21-99) for interchanging floe
state with the original MATLAB SubZero model (Manucharyan & Montemuro,
doi:10.1029/2022MS003247); that code is partially broken (duplicated
blocks, references to undefined variables).  This is a WORKING equivalent
over the same field-name conventions, built on scipy.io:

  * ``matfloes_to_floes(path, ...)`` - read a .mat holding a ``floe``
    struct (scalar or struct array) with MATLAB SubZero's field names
    (``c_alpha`` body-frame vertices, ``Xi/Yi`` centroid, ``h`` height,
    ``Ui/Vi/ksi_ice`` velocities, ``alpha_i`` rotation, ...) into a padded
    FloeState pool - e.g. to replay a MATLAB initial state through this
    framework for parity runs (SURVEY 7.3).
  * ``floes_to_mat(floes, path)`` - write the active floes back out with
    the julfloe2matfloe field names so MATLAB-side tooling can read them.

Round-trip is covered by tests/test_mat_convert.py.
"""

from __future__ import annotations

import numpy as np

from ..core.floes import FloeState, build_floes
from ..settings import FloeSettings

__all__ = ["matfloes_to_floes", "floes_to_mat"]


def _unwrap(x):
    """Peel the object-array wrappers scipy.io puts around struct fields."""
    while isinstance(x, np.ndarray) and x.dtype == object and x.size == 1:
        x = x.reshape(-1)[0]
    return x


def _field(rec, name, default=None):
    """Fetch a field from a scipy.io mat_struct / structured void / dict."""
    if isinstance(rec, dict):
        if name in rec:
            return _unwrap(rec[name])
    elif hasattr(rec, "dtype") and rec.dtype.names and name in rec.dtype.names:
        return _unwrap(rec[name])
    elif hasattr(rec, name):
        return _unwrap(getattr(rec, name))
    if default is not None:
        return default
    raise KeyError(name)


def _scalar(x):
    return float(np.asarray(x).reshape(-1)[0])


def matfloes_to_floes(
    path: str,
    floe_settings: FloeSettings = FloeSettings(),
    rng=None,
    **build_kwargs,
) -> FloeState:
    """Read MATLAB SubZero floes from ``path`` into a FloeState pool.

    Mirrors matfloe2julfloes (file_convert.jl:21-52): each floe's world
    polygon is ``c_alpha`` (2 x V body-frame vertices) translated by its
    centroid ``(Xi, Yi)``; height ``h`` seeds the mass; kinematics
    ``Ui/Vi/ksi_ice`` and rotation ``alpha_i`` carry over.  Remaining Floe
    fields (subfloe points, moment, rmax, ...) are recomputed by the
    normal constructor path - they are derived quantities.
    """
    from scipy.io import loadmat

    if rng is None:
        rng = np.random.default_rng(0)
    vars_ = loadmat(path, squeeze_me=True, struct_as_record=True)
    if "floe" not in vars_:
        raise KeyError(f"{path} holds no 'floe' struct")
    fstruct = vars_["floe"]
    recs = np.atleast_1d(fstruct)

    rings, heights, us, vs, xis, alphas = [], [], [], [], [], []
    for rec in recs:
        c_alpha = np.asarray(_field(rec, "c_alpha"), float)
        if c_alpha.shape[0] != 2:
            c_alpha = c_alpha.T
        xi_c = _scalar(_field(rec, "Xi"))
        yi_c = _scalar(_field(rec, "Yi"))
        ring = np.stack(
            [c_alpha[0] + xi_c, c_alpha[1] + yi_c], axis=-1
        )
        rings.append(ring)
        heights.append(_scalar(_field(rec, "h")))
        us.append(_scalar(_field(rec, "Ui", 0.0)))
        vs.append(_scalar(_field(rec, "Vi", 0.0)))
        xis.append(_scalar(_field(rec, "ksi_ice", 0.0)))
        alphas.append(_scalar(_field(rec, "alpha_i", 0.0)))

    # build with per-floe exact heights (dh = 0, hmean per call is not
    # per-floe, so build one at a time and concatenate is wasteful - use
    # hmean = each height via a single pool of max capacity)
    floes = build_floes(
        rings, float(np.mean(heights)), 0.0, floe_settings, rng,
        **build_kwargs,
    )
    act = np.asarray(floes.active)
    rows = np.flatnonzero(act)[: len(rings)]
    h = np.array(floes.height)
    m = np.array(floes.mass)
    a = np.array(floes.area)
    mom = np.array(floes.moment)
    u_arr = np.array(floes.u)
    v_arr = np.array(floes.v)
    xi_arr = np.array(floes.xi)
    al_arr = np.array(floes.alpha)
    for k, r in enumerate(rows):
        # exact per-floe height: rescale mass/moment from the hmean draw
        ratio = heights[k] / h[r]
        h[r] = heights[k]
        m[r] *= ratio
        mom[r] *= ratio
        u_arr[r] = us[k]
        v_arr[r] = vs[k]
        xi_arr[r] = xis[k]
        al_arr[r] = alphas[k]
    import jax.numpy as jnp

    return floes._replace(
        height=jnp.asarray(h), mass=jnp.asarray(m), moment=jnp.asarray(mom),
        u=jnp.asarray(u_arr), v=jnp.asarray(v_arr), xi=jnp.asarray(xi_arr),
        alpha=jnp.asarray(al_arr),
    )


def floes_to_mat(floes: FloeState, path: str) -> None:
    """Write the active floes of a pool to ``path`` with julfloe2matfloe's
    field names (file_convert.jl:77-99): per-floe cell-style vertex arrays
    plus the kinematic/force columns."""
    from scipy.io import savemat

    act = np.asarray(floes.active)
    rows = np.flatnonzero(act)
    nv = np.asarray(floes.nverts)
    verts = np.asarray(floes.verts)
    xcoords = np.empty(len(rows), object)
    ycoords = np.empty(len(rows), object)
    for k, r in enumerate(rows):
        ring = verts[r, : nv[r]]
        xcoords[k] = ring[:, 0].reshape(1, -1)
        ycoords[k] = ring[:, 1].reshape(1, -1)
    sub_x = np.asarray(floes.sub_x)
    sub_y = np.asarray(floes.sub_y)
    nsub = np.asarray(floes.nsub)
    xs = np.empty(len(rows), object)
    ys = np.empty(len(rows), object)
    for k, r in enumerate(rows):
        xs[k] = sub_x[r, : nsub[r]]
        ys[k] = sub_y[r, : nsub[r]]
    savemat(
        path,
        {
            "xcoords": xcoords,
            "ycoords": ycoords,
            "x_subfloe_points": xs,
            "y_subfloe_points": ys,
            "u": np.asarray(floes.u)[rows],
            "v": np.asarray(floes.v)[rows],
            "ksi_ice": np.asarray(floes.xi)[rows],
            "alpha_i": np.asarray(floes.alpha)[rows],
            "h": np.asarray(floes.height)[rows],
            "fxOA": np.asarray(floes.fx_oa)[rows],
            "fyOA": np.asarray(floes.fy_oa)[rows],
            "torqueOA": np.asarray(floes.trq_oa)[rows],
            "collision_force": np.asarray(floes.collision_force)[rows],
            "collision_torque": np.asarray(floes.collision_trq)[rows],
            "stress": np.asarray(floes.stress_accum)[rows],
            "strain": np.asarray(floes.strain)[rows],
        },
    )
