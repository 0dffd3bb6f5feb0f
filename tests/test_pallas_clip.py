"""Pallas narrow-phase kernel vs the jnp reference implementation.

Runs the Pallas kernel in interpreter mode on CPU and asserts elementwise
agreement with two_cross_pass on random convex/star rings in all regimes:
disjoint, two-crossing single region, containment, multi-crossing.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from subzero_tpu.geometry.clip import two_cross_pass
from subzero_tpu.geometry.pallas_clip import two_cross_pallas


def star_ring(rng, nv, cx, cy, r0):
    th = np.sort(rng.random(nv)) * 2 * np.pi
    r = r0 * (0.5 + rng.random(nv))
    return np.stack([cx + r * np.cos(th), cy + r * np.sin(th)], axis=1)


def build_batch(B=256, seed=0):
    rng = np.random.default_rng(seed)
    pv = np.zeros((B, 16, 2), np.float32)
    qv = np.zeros((B, 16, 2), np.float32)
    pn = np.zeros((B,), np.int32)
    qn = np.zeros((B,), np.int32)
    for k in range(B):
        nv = int(rng.integers(3, 17))
        ring = star_ring(rng, nv, 0.0, 0.0, 1.0)
        pv[k, :nv] = ring
        pv[k, nv:] = ring[-1]
        pn[k] = nv
        nw = int(rng.integers(3, 17))
        mode = k % 4
        if mode == 0:      # likely overlapping
            dx, dy, s = rng.uniform(-1, 1, 2).tolist() + [1.0]
        elif mode == 1:    # disjoint
            dx, dy, s = 5.0 + rng.random(), 5.0, 1.0
        elif mode == 2:    # Q tiny, likely contained
            dx, dy, s = 0.0, 0.0, 0.15
        else:              # P contained in big Q
            dx, dy, s = 0.0, 0.0, 8.0
        ring = star_ring(rng, nw, dx, dy, s)
        qv[k, :nw] = ring
        qv[k, nw:] = ring[-1]
        qn[k] = nw
    pert = (1e-6 * (1 + rng.random(B))).astype(np.float32)
    return (jnp.asarray(pv), jnp.asarray(pn), jnp.asarray(qv),
            jnp.asarray(qn), jnp.asarray(pert))


def test_pallas_matches_jnp_reference():
    pv, pn, qv, qn, pert = build_batch()
    ref = two_cross_pass(pv, pn, qv, qn, pert)
    got = two_cross_pallas(pv, pn, qv, qn, pert, interpret=True)

    np.testing.assert_array_equal(np.asarray(got.cnt), np.asarray(ref.cnt))
    np.testing.assert_array_equal(np.asarray(got.ok), np.asarray(ref.ok))
    np.testing.assert_allclose(
        np.asarray(got.contain), np.asarray(ref.contain), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.area), np.asarray(ref.area), rtol=1e-4, atol=1e-6
    )
    ok = np.asarray(ref.ok)
    for f in ("centroid", "chord_a", "chord_b", "p_norm"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, f))[ok],
            np.asarray(getattr(ref, f))[ok],
            rtol=1e-4, atol=1e-5, err_msg=f,
        )
    # the batch actually exercises every regime
    cnts = np.asarray(ref.cnt)
    assert (cnts == 0).any() and (cnts == 2).any() and (cnts > 2).any()
    assert (np.asarray(ref.contain) > 0).any()
    assert ok.any()
