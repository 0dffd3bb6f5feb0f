#!/usr/bin/env python
"""Benchmark: floe-pair contact interactions per second per chip.

Headline metric from BASELINE.json: >= 1e6 floe-pair interactions/s/chip.
Builds a dense 500-floe shear-flow-style field (the reference's largest
example scale, examples/shear_flow.jl), runs full physics steps (collisions
+ coupling + integration) on the default device, and reports the broad-phase
candidate pairs processed per second through the contact kernel.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from subzero_tpu.constants import Constants
    from subzero_tpu.core import (
        BoundaryKind,
        initialize_floe_field,
        make_atmos,
        make_domain,
        make_grid,
        make_model,
        make_ocean,
    )
    from subzero_tpu.physics.collisions import find_candidate_pairs
    from subzero_tpu.settings import (
        CouplingSettings,
        FloeSettings,
        SubGridPointsGenerator,
    )
    from subzero_tpu.simulation import Simulation, build_step

    dtype = jnp.float32
    Lx = 1e5
    grid = make_grid(0.0, Lx, 0.0, Lx, dx=2e3, dy=2e3)
    ocean_u = np.concatenate(
        [np.linspace(0, 0.5, 26), np.linspace(0.5, 0, 25)]
    )[None, :].repeat(51, axis=0)
    ocean = make_ocean(grid, u=ocean_u.T.T, v=0.0, temp=0.0, dtype=dtype)
    atmos = make_atmos(grid, u=0.0, v=0.0, temp=-1.0, dtype=dtype)
    domain = make_domain(grid, *([BoundaryKind.PERIODIC] * 4), dtype=dtype)
    fs = FloeSettings(
        min_floe_area=1e6,
        subfloe_point_generator=SubGridPointsGenerator.from_grid(grid, 2),
    )
    rng = np.random.default_rng(1)
    floes = initialize_floe_field(
        500, [0.8], domain, 0.25, 0.0, fs, rng=rng, dtype=dtype
    )
    n_floes = int(floes.count())
    model = make_model(grid, ocean, atmos, domain, floes)
    area = np.asarray(floes.area)[np.asarray(floes.active)]
    modulus = 1.5e3 * (np.mean(np.sqrt(area)) + np.min(np.sqrt(area)))
    sim = Simulation(
        model=model,
        consts=Constants(E=float(modulus)),
        dt=20,
        n_dt=0,
        floe_settings=fs,
        coupling_settings=CouplingSettings(two_way_coupling_on=False),
    )
    step = build_step(sim)

    fl, oc, dm = model.floes, model.ocean, model.domain
    # how many candidate pairs does the broad phase feed the contact kernel?
    pairs = find_candidate_pairs(fl, dm, sim.pair_cap)
    pairs_per_step = int(jnp.sum(pairs.valid))

    # scan the step so per-dispatch host<->device overhead amortizes away
    # (production runs use run_scan the same way when no host-side
    # topology ops are scheduled)
    n_steps = 50

    @jax.jit
    def run_block(fl, oc, dm, t0):
        def body(carry, t):
            fl, oc, dm = carry
            fl, oc, dm, _ = step(fl, oc, dm, t)
            return (fl, oc, dm), None

        (fl, oc, dm), _ = jax.lax.scan(
            body, (fl, oc, dm), t0 + jnp.arange(n_steps)
        )
        return fl, oc, dm

    # warmup/compile
    fl1, oc1, dm1 = run_block(fl, oc, dm, jnp.asarray(1))
    jax.block_until_ready(fl1.centroid)

    t0 = time.perf_counter()
    fl, oc, dm = run_block(fl, oc, dm, jnp.asarray(1))
    jax.block_until_ready(fl.centroid)
    elapsed = time.perf_counter() - t0

    steps_per_s = n_steps / elapsed
    pairs_per_s = pairs_per_step * steps_per_s
    print(
        json.dumps(
            {
                "metric": "floe-pair interactions/s/chip (500-floe shear_flow, full step)",
                "value": round(pairs_per_s, 1),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_s / 1e6, 3),
                "detail": {
                    "steps_per_s": round(steps_per_s, 3),
                    "pairs_per_step": pairs_per_step,
                    "n_floes": n_floes,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
