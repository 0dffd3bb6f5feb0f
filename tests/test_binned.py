"""Binned broad phase must find exactly the same candidate pairs as the
dense O(N^2) broad phase."""

import numpy as np
import jax.numpy as jnp
import pytest

from subzero_tpu.core import (
    BoundaryKind,
    initialize_floe_field,
    make_domain,
    make_grid,
)
from subzero_tpu.physics.collisions import find_candidate_pairs
from subzero_tpu.settings import FloeSettings, SubGridPointsGenerator


@pytest.mark.parametrize("periodic", [True, False])
def test_binned_matches_dense(periodic):
    grid = make_grid(0.0, 1e5, 0.0, 1e5, dx=2e3, dy=2e3)
    kind = BoundaryKind.PERIODIC if periodic else BoundaryKind.OPEN
    domain = make_domain(grid, *([kind] * 4), dtype=jnp.float64)
    fs = FloeSettings(
        min_floe_area=1e6,
        subfloe_point_generator=SubGridPointsGenerator(1e9),
    )
    floes = initialize_floe_field(
        200, [0.8], domain, 0.25, 0.0, fs, rng=np.random.default_rng(5),
        dtype=jnp.float64, shrink_frac=0.0,
    )
    pair_cap = 8 * floes.capacity
    dense = find_candidate_pairs(floes, domain, pair_cap)
    rmax = float(np.max(np.asarray(floes.rmax)))
    nb = max(int(1e5 / (2.2 * rmax)), 1)
    binned = find_candidate_pairs(floes, domain, pair_cap, (nb, nb, 64))

    def pairset(p):
        v = np.asarray(p.valid)
        qi = np.asarray(p.qi)[v]
        qj = np.asarray(p.qj)[v]
        sx = np.asarray(p.shift)[v][:, 0].round(3)
        sy = np.asarray(p.shift)[v][:, 1].round(3)
        return set(zip(qi.tolist(), qj.tolist(), sx.tolist(), sy.tolist()))

    assert not bool(dense.overflow)
    assert not bool(binned.overflow)
    assert pairset(dense) == pairset(binned)
