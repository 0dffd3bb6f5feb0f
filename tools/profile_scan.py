#!/usr/bin/env python
"""Steady-state per-phase cost under lax.scan (no per-call dispatch).

Each phase runs n_iter times inside one jitted lax.scan with a data
dependence threaded through the carry (a tiny centroid perturbation
derived from the previous iteration's output), so XLA cannot hoist or
elide the work, and the remote-dispatch latency of the axon tunnel is
amortized away.  Compare with tools/profile_step.py (per-call timings).

  PYTHONPATH="$PYTHONPATH:/root/repo" nohup python tools/profile_scan.py \
      > /tmp/profile_scan.out 2>&1 &
"""

import sys
import time

import numpy as np


def scan_time(make_body, fl, n_iter=100, warmup=1):
    """ms per iteration of body(fl, k) -> scalar, chained through fl."""
    import jax
    import jax.numpy as jnp

    body = make_body()

    @jax.jit
    def run(fl0):
        def f(carry, k):
            fl_, acc = carry
            out = body(fl_, k)
            # thread a O(ulp) dependence into the next iteration's input
            eps = (out.astype(fl_.centroid.dtype) % 2.0) * 1e-30
            fl_ = fl_._replace(centroid=fl_.centroid + eps)
            return (fl_, acc + out), ()

        (fl1, acc), _ = jax.lax.scan(f, (fl0, jnp.zeros((), jnp.float32)), jnp.arange(n_iter))
        return acc

    acc = run(fl)
    jax.block_until_ready(acc)
    t0 = time.perf_counter()
    acc = run(fl)
    jax.block_until_ready(acc)
    return (time.perf_counter() - t0) / n_iter * 1e3


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
    from subzero_tpu.physics import collisions as C
    from subzero_tpu.physics import coupling as CP
    from subzero_tpu.physics import simplification as S
    from subzero_tpu.physics import update_floe as UF
    from subzero_tpu.settings import (
        CouplingSettings,
        FloeSettings,
        SubGridPointsGenerator,
    )
    from subzero_tpu.simulation import Simulation, build_step

    # usage: profile_scan.py [n_floes L use_bins]  (default 500 1e5 0)
    n_floes = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    Lx = float(sys.argv[2]) if len(sys.argv) > 2 else 1e5
    use_bins = len(sys.argv) > 3 and sys.argv[3] not in ("0", "")

    dtype = jnp.float32
    grid = make_grid(0.0, Lx, 0.0, Lx, dx=2e3, dy=2e3)
    ny = grid.Ny + 1
    half = ny // 2 + 1
    uvels = np.concatenate(
        [np.linspace(0, 0.5, half), np.linspace(0.5, 0, ny - half)]
    )
    ocean_u = np.broadcast_to(uvels[None, :], (grid.Nx + 1, ny))
    ocean = make_ocean(grid, u=ocean_u, v=0.0, temp=0.0, dtype=dtype)
    atmos = make_atmos(grid, u=0.0, v=0.0, temp=-1.0, dtype=dtype)
    domain = make_domain(grid, *([BoundaryKind.PERIODIC] * 4), dtype=dtype)
    fs = FloeSettings(
        min_floe_area=1e6,
        subfloe_point_generator=SubGridPointsGenerator.from_grid(grid, 2),
    )
    rng = np.random.default_rng(1)
    floes = initialize_floe_field(
        n_floes, [0.8], domain, 0.25, 0.0, fs, rng=rng, dtype=dtype
    )
    model = make_model(grid, ocean, atmos, domain, floes)
    area = np.asarray(floes.area)[np.asarray(floes.active)]
    modulus = 1.5e3 * (np.mean(np.sqrt(area)) + np.min(np.sqrt(area)))
    consts = Constants(E=float(modulus))
    cps = CouplingSettings(two_way_coupling_on=False)
    sim = Simulation(
        model=model, consts=consts, dt=20, n_dt=0,
        floe_settings=fs, coupling_settings=cps,
    )
    if use_bins:
        from subzero_tpu.simulation import _auto_bins

        sim.bins = _auto_bins(model)
        sim.pair_cap = 16 * model.floes.capacity
        print("bins:", sim.bins, "pair_cap:", sim.pair_cap, flush=True)
    dt = 20.0
    print("device:", jax.devices()[0], flush=True)

    fl, oc, dm = model.floes, model.ocean, model.domain
    N = fl.capacity
    step = build_step(sim)

    ms = scan_time(
        lambda: (lambda f, k: jnp.sum(step(f, oc, dm, k)[0].centroid)), fl
    )
    print(f"full step:          {ms:8.3f} ms", flush=True)

    ms = scan_time(
        lambda: (
            lambda f, k: jnp.sum(
                C.find_candidate_pairs(f, dm, sim.pair_cap, sim.bins).valid
            ).astype(jnp.float32)
        ),
        fl,
    )
    print(f"broad phase:        {ms:8.3f} ms", flush=True)

    pairs = jax.jit(
        lambda f: C.find_candidate_pairs(f, dm, sim.pair_cap, sim.bins)
    )(fl)

    from subzero_tpu.core.domain import wall_rect
    from subzero_tpu.geometry.clip import two_cross_pass

    V = fl.max_verts
    wall_vs, wall_ns = [], []
    for w in range(4):
        wv, wn = wall_rect(dm, w, V, dtype)
        wall_vs.append(wv)
        wall_ns.append(wn)
    q_verts = jnp.concatenate(
        [fl.verts, jnp.stack(wall_vs), dm.topography.verts.astype(dtype)],
        axis=0,
    )
    q_n = jnp.concatenate(
        [fl.nverts, jnp.stack(wall_ns), dm.topography.nverts], axis=0
    )

    def narrow_body():
        def body(f, k):
            i0 = pairs.qi
            j0 = pairs.qj
            p = 2e-6 * (f.rmax[i0] + f.rmax[jnp.minimum(j0, N - 1)])
            out = two_cross_pass(
                f.verts[i0], f.nverts[i0],
                q_verts[j0] + pairs.shift[:, None, :], q_n[j0], p,
            )
            return sum(jnp.sum(o).astype(jnp.float32) for o in out[:2])

        return body

    ms = scan_time(narrow_body, fl)
    print(f"narrow + gathers:   {ms:8.3f} ms", flush=True)

    ms = scan_time(
        lambda: (
            lambda f, k: jnp.sum(
                C.timestep_collisions(
                    f, dm, consts, dt, sim.collision_settings, sim.pair_cap,
                    sim.clip_cap, sim.bins,
                ).floes.collision_force
            )
        ),
        fl,
    )
    print(f"collisions total:   {ms:8.3f} ms", flush=True)

    ms = scan_time(
        lambda: (
            lambda f, k: jnp.sum(
                CP.timestep_coupling(
                    f, grid, dm, oc, atmos, consts, cps, fs, dt, sim.cell_cap
                )[0].fx_oa
            )
        ),
        fl,
    )
    print(f"coupling (one-way): {ms:8.3f} ms", flush=True)

    cps2 = CouplingSettings(two_way_coupling_on=True)
    ms = scan_time(
        lambda: (
            lambda f, k: jnp.sum(
                CP.timestep_coupling(
                    f, grid, dm, oc, atmos, consts, cps2, fs, dt, sim.cell_cap
                )[1].tau_x
            )
        ),
        fl,
    )
    print(f"coupling (two-way): {ms:8.3f} ms", flush=True)

    # slow-path region kernel at its in-step capacity
    from subzero_tpu.geometry.clip import intersect_regions

    slow_cap = max(sim.pair_cap // 128, 32)
    iz = jnp.zeros((slow_cap,), jnp.int32)
    ms = scan_time(
        lambda: (
            lambda f, k: jnp.sum(
                jax.vmap(
                    lambda a, b, c2, d: intersect_regions(
                        a, b, c2, d, CAP=sim.clip_cap
                    ).total_area
                )(f.verts[iz], f.nverts[iz], q_verts[iz], q_n[iz])
            )
        ),
        fl,
    )
    print(f"slow region kernel: {ms:8.3f} ms  (cap={slow_cap})", flush=True)

    si = jnp.zeros_like(fl.stress_accum)
    ms = scan_time(
        lambda: (
            lambda f, k: jnp.sum(
                UF.timestep_floe_properties(f, dt, fs, si).centroid
            )
        ),
        fl,
    )
    print(f"integrator:         {ms:8.3f} ms", flush=True)

    ms = scan_time(
        lambda: (
            lambda f, k: jnp.sum(
                S.remove_and_dissolve(f, oc, grid, dm, fs)[0].area
            )
        ),
        fl,
    )
    print(f"remove/dissolve:    {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
