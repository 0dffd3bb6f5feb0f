"""Binned broad phase must find exactly the same candidate pairs as the
dense O(N^2) broad phase.

Pairs are compared as UNORDERED (i, j) with the min-image shift sign
normalized to the lower index: which side's row enumerates a pair is an
implementation detail (dense uses (i+j)-parity ownership, the binned
half-shell assigns cross-bin pairs to the forward side), and the force
accumulation folds +-F to both sides either way."""

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

    N = floes.capacity

    def pairset(p):
        v = np.asarray(p.valid)
        qi = np.asarray(p.qi)[v]
        qj = np.asarray(p.qj)[v]
        sx = np.asarray(p.shift)[v][:, 0].round(3) + 0.0
        sy = np.asarray(p.shift)[v][:, 1].round(3) + 0.0
        out = set()
        n_rows = 0
        for i, j, x, y in zip(
            qi.tolist(), qj.tolist(), sx.tolist(), sy.tolist()
        ):
            if j < N and j < i:  # canonicalize floe-floe pairs
                i, j, x, y = j, i, -x + 0.0, -y + 0.0
            out.add((i, j, x, y))
            n_rows += 1
        # exactly-once enumeration: duplicates would vanish in the set
        assert n_rows == len(out)
        return out

    assert not bool(dense.overflow)
    assert not bool(binned.overflow)
    assert pairset(dense) == pairset(binned)
