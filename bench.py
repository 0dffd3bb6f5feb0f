#!/usr/bin/env python
"""Benchmark: floe-pair contact interactions per second per chip.

Headline metric from BASELINE.json: >= 1e6 floe-pair interactions/s/chip.
Two configs are measured:

  * shear_flow  - the reference's largest example scale (~500 floes,
    51x51 grid, examples/shear_flow.jl), dense broad phase.
  * many_floes  - a 4x larger field (~2000 floes, same floe sizes on a
    2x domain), binned broad phase, showing throughput scales with pair
    count.

Full physics steps (collisions + coupling at cadence + integration +
removal) run under one jitted lax.scan on the default device; the metric
counts broad-phase candidate pairs processed through the contact kernel.

Prints ONE JSON line with the best config as the headline:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": ...}
"""

import json
import time

import numpy as np


def build_sim(n_floes, L, dx, seed=1):
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
    from subzero_tpu.settings import (
        CouplingSettings,
        FloeSettings,
        SubGridPointsGenerator,
    )
    from subzero_tpu.simulation import Simulation

    dtype = jnp.float32
    grid = make_grid(0.0, L, 0.0, L, dx=dx, dy=dx)
    ny = grid.Ny + 1
    half = ny // 2 + 1
    uvels = np.concatenate(
        [np.linspace(0, 0.5, half), np.linspace(0.5, 0, ny - half)]
    )
    u_field = np.broadcast_to(uvels[None, :], (grid.Nx + 1, ny))
    ocean = make_ocean(grid, u=u_field, v=0.0, temp=0.0, dtype=dtype)
    atmos = make_atmos(grid, u=0.0, v=0.0, temp=-1.0, dtype=dtype)
    domain = make_domain(grid, *([BoundaryKind.PERIODIC] * 4), dtype=dtype)
    fs = FloeSettings(
        min_floe_area=1e6,
        subfloe_point_generator=SubGridPointsGenerator.from_grid(grid, 2),
    )
    floes = initialize_floe_field(
        n_floes, [0.8], domain, 0.25, 0.0, fs,
        rng=np.random.default_rng(seed), dtype=dtype,
    )
    model = make_model(grid, ocean, atmos, domain, floes)
    area = np.asarray(floes.area)[np.asarray(floes.active)]
    modulus = 1.5e3 * (np.mean(np.sqrt(area)) + np.min(np.sqrt(area)))
    return Simulation(
        model=model,
        consts=Constants(E=float(modulus)),
        dt=20,
        n_dt=0,
        floe_settings=fs,
        coupling_settings=CouplingSettings(two_way_coupling_on=False),
    )


def measure(sim, n_steps=50):
    import jax
    import jax.numpy as jnp

    from subzero_tpu.physics.collisions import find_candidate_pairs
    from subzero_tpu.simulation import build_step

    step = build_step(sim)
    model = sim.model
    fl, oc, dm = model.floes, model.ocean, model.domain
    pairs = find_candidate_pairs(fl, dm, sim.pair_cap, sim.bins)
    pairs_per_step = int(jnp.sum(pairs.valid))

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

    fl1, oc1, dm1 = run_block(fl, oc, dm, jnp.asarray(1))
    jax.block_until_ready(fl1.centroid)
    t0 = time.perf_counter()
    fl1, oc1, dm1 = run_block(fl, oc, dm, jnp.asarray(1))
    jax.block_until_ready(fl1.centroid)
    elapsed = time.perf_counter() - t0

    steps_per_s = n_steps / elapsed
    return {
        "pairs_per_s": pairs_per_step * steps_per_s,
        "steps_per_s": round(steps_per_s, 3),
        "pairs_per_step": pairs_per_step,
        "n_floes": int(fl.count()),
        "binned": sim.bins is not None,
    }


def main():
    import jax

    configs = {
        # the reference's largest example scale (shear_flow.jl)
        "shear_flow_500": build_sim(500, 1e5, 2e3),
        # 4x the floes at the same floe scale: binned broad phase
        "many_floes_2000": build_sim(2000, 2e5, 2e3),
    }
    detail = {"device": str(jax.devices()[0])}
    best_name, best = None, None
    for name, sim in configs.items():
        r = measure(sim)
        r["pairs_per_s"] = round(r["pairs_per_s"], 1)
        detail[name] = r
        if best is None or r["pairs_per_s"] > best:
            best, best_name = r["pairs_per_s"], name
    print(
        json.dumps(
            {
                "metric": (
                    "floe-pair interactions/s/chip "
                    f"(full step, best config: {best_name})"
                ),
                "value": best,
                "unit": "pairs/s",
                "vs_baseline": round(best / 1e6, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
