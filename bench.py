#!/usr/bin/env python
"""Benchmark: floe-pair contact interactions per second per chip.

Headline metric from BASELINE.json: >= 1e6 floe-pair interactions/s/chip.
Configs (reference-faithful physics: two-way coupling ON, matching
/root/reference/examples/shear_flow.jl:35-38):

  * shear_flow_500  - the reference's largest example scale (~500 floes,
    51x51 grid, examples/shear_flow.jl), dense broad phase.
  * many_floes_2000 - a 4x larger field (~2000 floes, same floe sizes on a
    2x domain), dense broad phase.
  * many_floes_8000 - 16x the floes on a 4x domain, binned O(N*M) broad
    phase (spatial 3x3-neighborhood candidate lists).

Full physics steps (collisions + coupling at cadence + integration +
removal) run under one jitted lax.scan on the default device; the metric
counts broad-phase candidate pairs processed through the contact kernel.
``detail`` carries a per-phase breakdown (collisions / coupling / other)
measured by scan-timing the step with each phase toggled off.

Scan lengths are sized so the per-dispatch fixed cost (~20 ms measured on
the tunnel by tools/probe_fixedcost.py: host->TPU launch round-trip,
independent of scan length) is <3% of the block: the metric is per-step
device throughput, which is what a production driver sees (run/run_scan
amortize dispatch over the whole segment between host events).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": ...}
"""

import json
import time

import numpy as np


def build_sim(n_floes, L, dx, seed=1, two_way=True, bins=False,
              coupling=True, collisions=True):
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
        CollisionSettings,
        CouplingSettings,
        FloeSettings,
        SubGridPointsGenerator,
    )
    from subzero_tpu.simulation import Simulation, _auto_bins

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
    sim = Simulation(
        model=model,
        consts=Constants(E=float(modulus)),
        dt=20,
        n_dt=0,
        floe_settings=fs,
        coupling_settings=CouplingSettings(
            coupling_on=coupling, two_way_coupling_on=two_way
        ),
        collision_settings=CollisionSettings(collisions_on=collisions),
        # pin the broad phase per config (bins="auto" would pick for us at
        # AUTO_BINS_MIN_N; the bench wants both variants measurable)
        bins=None,
    )
    if bins:
        sim.bins = _auto_bins(model)
        # per-floe candidate rows: mean contact degree at conc 0.8 is ~3.5
        # (p99 8, max 11 with balanced ownership), and the _rank_select_rows
        # spill list absorbs the rare deep rows - so row_cap 8 suffices and
        # every narrow-phase pass pays per PADDED row (tools/ab_rowcap.py,
        # TPU v5e N=16k: 12N 26.0 ms -> 8N 20.2 ms, zero overflow; 6N is
        # not faster).  Overflow surfaces if a config exceeds the budget.
        sim.pair_cap = 8 * model.floes.capacity
    return sim


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
    elapsed = float("inf")
    for _ in range(4):  # min over reps: tunnel jitter is one-sided noise
        # (observed up to 1.6x run-to-run on identical programs)
        t0 = time.perf_counter()
        fl1, oc1, dm1 = run_block(fl, oc, dm, jnp.asarray(1))
        jax.block_until_ready(fl1.centroid)
        elapsed = min(elapsed, time.perf_counter() - t0)

    steps_per_s = n_steps / elapsed
    return {
        "pairs_per_s": pairs_per_step * steps_per_s,
        "steps_per_s": round(steps_per_s, 3),
        "step_ms": round(1e3 / steps_per_s, 4),
        "pairs_per_step": pairs_per_step,
        "n_floes": int(fl.count()),
        "binned": sim.bins is not None,
        "two_way_coupling": bool(sim.coupling_settings.two_way_coupling_on),
    }


def main():
    import jax

    configs = {
        # reference's largest example scale, full shear_flow.jl physics
        "shear_flow_500": dict(n=500, L=1e5, bins=False, n_steps=400),
        # 4x the floes at the same floe scale, dense broad phase
        "many_floes_2000": dict(n=2000, L=2e5, bins=False, n_steps=150),
        # 16x the floes, binned O(N*M) broad phase
        "many_floes_8000": dict(n=8000, L=4e5, bins=True, n_steps=50),
        # 32x the floes at the same density (sorted-member binned phase)
        "many_floes_16000": dict(n=16000, L=5.66e5, bins=True, n_steps=20),
        # 64x: the scale point where the binned path must hold >= 1.5 M
        "many_floes_32000": dict(n=32000, L=8e5, bins=True, n_steps=10),
    }
    detail = {"device": str(jax.devices()[0])}
    best_name, best = None, None
    for name, cfg in configs.items():
        sim = build_sim(cfg["n"], cfg["L"], 2e3, bins=cfg["bins"])
        r = measure(sim, n_steps=cfg["n_steps"])
        r["pairs_per_s"] = round(r["pairs_per_s"], 1)
        # per-phase breakdown by toggling phases off (scan-timed)
        if name == "shear_flow_500":
            no_cpl = measure(
                build_sim(cfg["n"], cfg["L"], 2e3, bins=cfg["bins"],
                          coupling=False),
                n_steps=cfg["n_steps"],
            )
            no_col = measure(
                build_sim(cfg["n"], cfg["L"], 2e3, bins=cfg["bins"],
                          collisions=False),
                n_steps=cfg["n_steps"],
            )
            col_ms = round(r["step_ms"] - no_col["step_ms"], 4)
            cpl_ms = round(r["step_ms"] - no_cpl["step_ms"], 4)
            r["phases_ms"] = {
                "collisions": col_ms,
                "coupling_amortized": cpl_ms,
                "integrate_remove_other": round(
                    r["step_ms"] - col_ms - cpl_ms, 4
                ),
            }
        detail[name] = r
        if best is None or r["pairs_per_s"] > best:
            best, best_name = r["pairs_per_s"], name
    print(
        json.dumps(
            {
                "metric": (
                    "floe-pair interactions/s/chip "
                    f"(full step, two-way coupling on, best config: {best_name})"
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
