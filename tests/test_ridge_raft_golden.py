"""Ridge/raft golden scenario matrix.

Ports the scenario tests of
/root/reference/test/test_physical_processes/test_ridge_raft.jl: the
probability and height gates, floe-floe subsumption direction, mass/
momentum bookkeeping, floe-domain mass loss vs. keep, aspect-ratio
rejection, and floe breakage into pieces.

Ghost-floe scenarios are intentionally not ported: the TPU design carries
periodic images as min-image pair shifts instead of ghost copies (see
physics/collisions.py), so there are no ghost rows to update.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from subzero_tpu.core import (
    BoundaryKind,
    make_domain,
    make_grid,
    make_topography,
)
from subzero_tpu.core.floes import build_floes, moment_inertia_np
from subzero_tpu.geometry import host_clip
from subzero_tpu.physics import lifecycle_host as lh
from subzero_tpu.physics.collisions import pair_overlaps
from subzero_tpu.settings import (
    FloeSettings,
    RidgeRaftSettings,
    SimplificationSettings,
    SubGridPointsGenerator,
)

DT = 10
FSET = FloeSettings(
    min_floe_area=1e7, subfloe_point_generator=SubGridPointsGenerator(1e9)
)
SIMP = SimplificationSettings()
GRID = make_grid(0.0, 1e5, 0.0, 1e5, dx=1e4, dy=1e4)
TOPO_RING = [[5e4, 5e4], [7e4, 5e4], [7e4, 7e4], [5e4, 7e4]]
TOPO = make_topography([TOPO_RING], dtype=jnp.float64)
C = BoundaryKind.COLLISION
DOMAIN = make_domain(GRID, C, C, C, C, topography=TOPO, dtype=jnp.float64)

RIDGE = RidgeRaftSettings(
    ridge_raft_on=True, dt=1,
    ridge_probability=1.0, raft_probability=0.0, min_overlap_frac=0.001,
)
RAFT = RidgeRaftSettings(
    ridge_raft_on=True, dt=1,
    ridge_probability=0.0, raft_probability=1.0,
    max_floe_raft_height=1.0, min_overlap_frac=0.001,
)


def _setup(coords, seed=3, N=8):
    floes = build_floes(coords, 1.0, 0.0, FSET, N=N, dtype=jnp.float64)
    n = len(coords)
    rng = np.random.default_rng(seed)
    ids = np.zeros(N, int)
    ids[:n] = np.arange(1, n + 1)
    kw = {}
    for k in ("u", "v", "p_dxdt", "p_dydt"):
        vals = np.zeros(N)
        vals[:n] = (-1.0) ** rng.integers(0, 2, n) * rng.random(n)
        kw[k] = jnp.asarray(vals)
    xi = np.zeros(N)
    xi[:n] = (-1.0) ** rng.integers(0, 2, n) * 0.05 * rng.random(n)
    return floes._replace(
        id=jnp.asarray(ids, floes.id.dtype), xi=jnp.asarray(xi), **kw
    )


def _set_height(hf, i, h):
    """update_height helper (test_ridge_raft.jl:4-15)."""
    f = hf.fields
    f["height"][i] = h
    f["mass"][i] = f["area"][i] * h * FSET.rho_i
    f["moment"][i] = moment_inertia_np(
        hf.ring(i), f["centroid"][i], h, FSET.rho_i
    )


def _overlaps(floes, domain):
    i, j, a, valid, overflow = pair_overlaps(floes, domain, 64 * floes.capacity)
    assert not bool(overflow)
    m = np.asarray(valid)
    return list(
        zip(
            np.asarray(i)[m].tolist(),
            np.asarray(j)[m].tolist(),
            np.asarray(a)[m].tolist(),
        )
    )


def _lin_momentum(hf, idx):
    f = hf.fields
    return np.array(
        [
            sum(f["mass"][i] * f["u"][i] for i in idx),
            sum(f["mass"][i] * f["v"][i] for i in idx),
            sum(f["mass"][i] * f["p_dxdt"][i] for i in idx),
            sum(f["mass"][i] * f["p_dydt"][i] for i in idx),
        ]
    )


def _run_rr(floes, rr, domain=DOMAIN, seed=1):
    ov = _overlaps(floes, domain)
    out, max_id = lh.timestep_ridging_rafting(
        floes, domain, ov, int(jnp.max(floes.id)), rr, FSET, SIMP, DT,
        np.random.default_rng(seed),
    )
    return out, max_id


FF_COORDS = [
    [[0.1e4, 0.1e4], [2e4, 0.1e4], [2e4, 2e4], [0.1e4, 2e4]],
    [[1.8e4, 1.8e4], [4e4, 1.8e4], [4e4, 4e4], [1.8e4, 4e4]],
]


def _ff_scenario(rr, h1, h2, floe1_subsume, floe2_subsume, seed=1):
    floes = _setup(FF_COORDS)
    hf = lh.HostFloes(floes)
    _set_height(hf, 0, h1)
    _set_height(hf, 1, h2)
    floes = hf.to_state()
    f0 = lh.HostFloes(floes).fields
    mass1, mass2 = f0["mass"][0], f0["mass"][1]
    mom1, mom2 = f0["moment"][0], f0["moment"][1]
    cent1, cent2 = f0["centroid"][0].copy(), f0["centroid"][1].copy()
    mom_before = _lin_momentum(lh.HostFloes(floes), [0, 1])
    out, _ = _run_rr(floes, rr, seed=seed)
    f = lh.HostFloes(out).fields
    assert f["mass"][0] + f["mass"][1] == pytest.approx(mass1 + mass2)
    mom_after = _lin_momentum(lh.HostFloes(out), [0, 1])
    np.testing.assert_allclose(mom_before, mom_after, rtol=1e-3)
    if floe1_subsume or floe2_subsume:
        g, l = (0, 1) if floe1_subsume else (1, 0)
        hg, ml_, mg_ = (h1, mass2, mass1) if floe1_subsume else (h2, mass1, mass2)
        inter = sum(
            host_clip.poly_area_np(p)
            for p in host_clip.intersect(
                lh.HostFloes(out).ring(0), lh.HostFloes(out).ring(1)
            )
        )
        assert inter < 1e-6 * f["area"][g]  # floes no longer overlap
        assert f["mass"][g] > mg_ and f["mass"][l] < ml_
        assert f["height"][g] > hg
        assert f["height"][l] == pytest.approx(h2 if floe1_subsume else h1)
        want_mom = (mom1 if floe1_subsume else mom2) * f["height"][g] / hg
        assert f["moment"][g] == pytest.approx(want_mom)
        np.testing.assert_array_equal(
            f["centroid"][g], cent1 if floe1_subsume else cent2
        )
        assert not np.array_equal(
            f["centroid"][l], cent2 if floe1_subsume else cent1
        )
    else:
        assert f["mass"][0] == mass1 and f["mass"][1] == mass2
        assert f["height"][0] == h1 and f["height"][1] == h2
        assert f["moment"][0] == mom1 and f["moment"][1] == mom2
        np.testing.assert_array_equal(f["centroid"][0], cent1)
        np.testing.assert_array_equal(f["centroid"][1], cent2)


def test_no_ridge_zero_probability():
    rr = RidgeRaftSettings(
        ridge_raft_on=True, dt=1, ridge_probability=0.0, raft_probability=0.0
    )
    _ff_scenario(rr, 1.0, 1.0, False, False)


def test_no_ridge_full_overlap_required():
    rr = RidgeRaftSettings(
        ridge_raft_on=True, dt=1,
        ridge_probability=1.0, raft_probability=1.0, min_overlap_frac=1.0,
    )
    _ff_scenario(rr, 1.0, 1.0, False, False)


def test_ridge_floe1_subsumes():
    """Floe 2 below min_ridge_height -> floe 1 gains (test_ridge_raft.jl
    ridge scenario 1)."""
    _ff_scenario(RIDGE, 1.0, 0.1, True, False)


def test_ridge_floe2_subsumes():
    _ff_scenario(RIDGE, 0.1, 1.0, False, True)


def test_ridge_both_too_thin():
    """Both floes below min_ridge_height -> no ridging."""
    _ff_scenario(RIDGE, 0.1, 0.1, False, False)


def test_raft_floe1_subsumes():
    """Extreme height ratio biases the raft gainer draw."""
    _ff_scenario(RAFT, 1.0, 0.001, True, False)


def test_raft_floe2_subsumes():
    _ff_scenario(RAFT, 0.001, 1.0, False, True)


# ---------------------------------------------------------------------------
# floe-domain scenarios
# ---------------------------------------------------------------------------

FD_COORDS = [
    [[-0.1e4, -0.1e4], [2e4, -0.1e4], [2e4, 2e4], [-0.1e4, 2e4]],
    [[3.5e4, 3.5e4], [5.5e4, 3.5e4], [5.5e4, 5.5e4], [3.5e4, 5.5e4]],
]
BOUNDS_OVERLAP = 2.1e4 ** 2 - 2e4 ** 2   # floe 1 sticking out S and W
TOPO_OVERLAP = 0.5e4 ** 2                # floe 2 corner on the topography


def _fd_scenario(rr, does_rr, lose_mass, h1, h2, seed=1):
    floes = _setup(FD_COORDS)
    hf = lh.HostFloes(floes)
    _set_height(hf, 0, h1)
    _set_height(hf, 1, h2)
    floes = hf.to_state()
    f0 = lh.HostFloes(floes).fields
    total_mass = f0["mass"][0] + f0["mass"][1]
    area1, area2 = f0["area"][0], f0["area"][1]
    cent1, cent2 = f0["centroid"][0].copy(), f0["centroid"][1].copy()
    mom_before = _lin_momentum(lh.HostFloes(floes), [0, 1])
    out, _ = _run_rr(floes, rr, seed=seed)
    f = lh.HostFloes(out).fields
    mom_after = _lin_momentum(lh.HostFloes(out), [0, 1])
    np.testing.assert_allclose(mom_before, mom_after, rtol=1e-3)
    if does_rr:
        if lose_mass:
            assert f["mass"][0] + f["mass"][1] < total_mass
            assert f["height"][0] == pytest.approx(h1)
            assert f["height"][1] == pytest.approx(h2)
        else:
            assert f["mass"][0] + f["mass"][1] == pytest.approx(total_mass)
            assert f["height"][0] > h1 and f["height"][1] > h2
        assert f["area"][0] == pytest.approx(area1 - BOUNDS_OVERLAP, rel=1e-6)
        assert f["area"][1] == pytest.approx(area2 - TOPO_OVERLAP, rel=1e-6)
        assert not np.array_equal(f["centroid"][0], cent1)
        assert not np.array_equal(f["centroid"][1], cent2)
        # no residual overlap beyond the walls / with the topography
        r0 = lh.HostFloes(out).ring(0)
        assert r0[:, 0].min() >= -1e-6 and r0[:, 1].min() >= -1e-6
        r1 = lh.HostFloes(out).ring(1)
        topo_inter = sum(
            host_clip.poly_area_np(p)
            for p in host_clip.intersect(r1, np.asarray(TOPO_RING))
        )
        assert topo_inter < 1e-6 * f["area"][1]
    else:
        assert f["mass"][0] + f["mass"][1] == pytest.approx(total_mass)
        assert f["height"][0] == pytest.approx(h1)
        assert f["height"][1] == pytest.approx(h2)
        assert f["area"][0] == pytest.approx(area1)
        assert f["area"][1] == pytest.approx(area2)
        np.testing.assert_array_equal(f["centroid"][0], cent1)
        np.testing.assert_array_equal(f["centroid"][1], cent2)


def test_domain_ridge_loses_mass():
    _fd_scenario(RIDGE, True, True, 0.1, 0.1)


def test_domain_no_ridge_too_thick():
    """Heights above max_domain_ridge_height (1.25) -> untouched."""
    _fd_scenario(RIDGE, False, True, 2.0, 2.0)


def test_domain_raft_loses_mass():
    rr = RidgeRaftSettings(
        ridge_raft_on=True, dt=1,
        ridge_probability=0.0, raft_probability=1.0, min_overlap_frac=0.001,
    )
    _fd_scenario(rr, True, True, 0.1, 0.1)


def test_domain_no_raft_too_thick():
    rr = RidgeRaftSettings(
        ridge_raft_on=True, dt=1,
        ridge_probability=0.0, raft_probability=1.0, min_overlap_frac=0.001,
    )
    _fd_scenario(rr, False, True, 0.3, 0.3)


def test_domain_ridge_keeps_mass():
    """domain_gain_probability = 0 -> volume redistributed onto the floe."""
    rr = RidgeRaftSettings(
        ridge_raft_on=True, dt=1,
        ridge_probability=1.0, raft_probability=0.0,
        min_overlap_frac=0.001, domain_gain_probability=0.0,
    )
    _fd_scenario(rr, True, False, 1.0, 1.0)


def test_domain_ridge_aspect_ratio_rejection():
    """A thin strip on the wall leaves a piece below the aspect-ratio /
    min-area gates -> the floe is removed, no pieces added
    (test_ridge_raft.jl:436-460)."""
    strip = [[-0.1e4, 0.1e4], [0.1e4, 0.1e4], [0.1e4, 9.9e4], [-0.1e4, 9.9e4]]
    floes = _setup([strip])
    out, _ = _run_rr(floes, RIDGE)
    f = lh.HostFloes(out).fields
    assert f["remove"][0] and not f["active"][0]
    assert int(out.count()) == 0


def test_small_leftover_subsumed_entirely():
    """Floe 2 leaves a too-small remnant outside floe 1 -> fully absorbed
    (test_ridge_raft.jl:499-532)."""
    coords = [
        [[1e4, 1e4], [5e4, 1e4], [5e4, 5e4], [1e4, 5e4]],
        [[0.84e4, 2e4], [4e4, 2e4], [4e4, 2.5e4], [0.84e4, 2.5e4]],
    ]
    floes = _setup(coords)
    hf = lh.HostFloes(floes)
    _set_height(hf, 1, 0.1)
    floes = hf.to_state()
    f0 = lh.HostFloes(floes).fields
    total_mass = f0["mass"][0] + f0["mass"][1]
    h1 = f0["height"][0]
    cent1 = f0["centroid"][0].copy()
    out, _ = _run_rr(floes, RIDGE)
    f = lh.HostFloes(out).fields
    assert f["mass"][0] == pytest.approx(total_mass)
    assert f["height"][0] > h1
    assert f["active"][0] and not f["active"][1]
    np.testing.assert_array_equal(f["centroid"][0], cent1)


def test_floe_breaks_into_pieces():
    """Ridging splits the thin floe into two pieces with fresh ids
    (test_ridge_raft.jl:534-575)."""
    coords = [
        [[2.75e4, 0.75e4], [3.25e4, 0.75e4], [1.25e4, 2.75e4], [0.75e4, 2.75e4]],
        [[0.1e4, 0.1e4], [2.25e4, 0.1e4], [2.25e4, 2.25e4], [0.1e4, 2.25e4]],
        [[2.5e4, 0.1e4], [3e4, 0.1e4], [3e4, 2.25e4], [2.5e4, 2.25e4]],
    ]
    fset = FloeSettings(
        min_floe_area=1e6, subfloe_point_generator=SubGridPointsGenerator(1e9)
    )
    floes = build_floes(coords, 1.0, 0.0, fset, N=8, dtype=jnp.float64)
    floes = floes._replace(
        id=jnp.asarray([1, 2, 3, 0, 0, 0, 0, 0], floes.id.dtype)
    )
    hf = lh.HostFloes(floes)
    _set_height(hf, 0, 0.1)
    floes = hf.to_state()
    f0 = lh.HostFloes(floes).fields
    total_mass = f0["mass"][:3].sum()
    h1, h2, h3 = f0["height"][:3]
    cent2 = f0["centroid"][1].copy()
    cent3 = f0["centroid"][2].copy()
    ov = _overlaps(floes, DOMAIN)
    out, max_id = lh.timestep_ridging_rafting(
        floes, DOMAIN, ov, 3, RIDGE, fset, SIMP, DT, np.random.default_rng(1)
    )
    f = lh.HostFloes(out).fields
    act = np.nonzero(f["active"])[0]
    assert len(act) == 4  # 3 originals (one reshaped) + 1 new piece
    assert f["mass"][act].sum() == pytest.approx(total_mass)
    # floe 1 ridged onto floe 2 and broke: heights
    assert f["height"][0] == pytest.approx(h1)
    assert f["height"][1] > h2
    piece = [s for s in act if s >= 3][0]
    assert f["height"][piece] == pytest.approx(h1)
    np.testing.assert_array_equal(f["centroid"][1], cent2)
    # floe 3 untouched
    assert f["height"][2] == pytest.approx(h3)
    np.testing.assert_array_equal(f["centroid"][2], cent3)
    # ids: broken floe gets a fresh id, piece gets one too
    assert max_id == 5
    assert sorted([int(f["id"][s]) for s in act]) == [2, 3, 4, 5]
    assert int(f["parent_id"][0]) == 1
