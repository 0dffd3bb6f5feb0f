#!/usr/bin/env python
"""Phase-level timing of the benchmark step on the current default device.

Times each jitted sub-phase of the 500-floe shear_flow step separately
(broad phase, fused narrow phase, slow-path region kernel, force recipe via
full collisions, coupling, integrator) so optimization effort goes where the
milliseconds are.  Run detached on TPU:

  nohup python tools/profile_step.py > /tmp/profile_step.out 2>&1 &
"""

import time

import numpy as np


def timeit(fn, *args, n=30, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


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
    from subzero_tpu.physics import update_floe as UF
    from subzero_tpu.geometry.clip import intersect_regions, two_cross_pass
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
    model = make_model(grid, ocean, atmos, domain, floes)
    area = np.asarray(floes.area)[np.asarray(floes.active)]
    modulus = 1.5e3 * (np.mean(np.sqrt(area)) + np.min(np.sqrt(area)))
    consts = Constants(E=float(modulus))
    cps = CouplingSettings(two_way_coupling_on=False)
    sim = Simulation(
        model=model, consts=consts, dt=20, n_dt=0,
        floe_settings=fs, coupling_settings=cps,
    )
    dt = 20.0
    print("device:", jax.devices()[0], flush=True)
    print("pair_cap:", sim.pair_cap, "cell_cap:", sim.cell_cap, flush=True)

    fl, oc, dm = model.floes, model.ocean, model.domain
    N = fl.capacity

    # full step
    step = build_step(sim)
    t = jnp.asarray(1)
    ms = timeit(lambda: step(fl, oc, dm, t))
    print(f"full step:            {ms:8.3f} ms", flush=True)

    # broad phase
    bp = jax.jit(lambda f: C.find_candidate_pairs(f, dm, sim.pair_cap, sim.bins))
    ms = timeit(lambda: bp(fl))
    print(f"broad phase:          {ms:8.3f} ms", flush=True)
    pairs = bp(fl)
    PC = int(pairs.qi.shape[0])
    nvalid = int(jnp.sum(pairs.valid))
    print(f"  PC={PC} valid={nvalid}", flush=True)

    # fused narrow phase (two_cross_pass) on the real candidate list
    from subzero_tpu.core.domain import wall_rect

    V = fl.max_verts
    wall_vs, wall_ns = [], []
    for w in range(4):
        wv, wn = wall_rect(dm, w, V, dtype)
        wall_vs.append(wv)
        wall_ns.append(wn)
    q_verts = jnp.concatenate(
        [fl.verts, jnp.stack(wall_vs), dm.topography.verts.astype(dtype)], axis=0
    )
    q_n = jnp.concatenate(
        [fl.nverts, jnp.stack(wall_ns), dm.topography.nverts], axis=0
    )
    i0, j0 = pairs.qi, pairs.qj
    perturb0 = 2e-6 * (fl.rmax[i0] + fl.rmax[jnp.minimum(j0, N - 1)])
    pv = fl.verts[i0]
    pn = fl.nverts[i0]
    qv = q_verts[j0] + pairs.shift[:, None, :]
    qn = q_n[j0]
    tc_fn = jax.jit(two_cross_pass)
    ms = timeit(lambda: tc_fn(pv, pn, qv, qn, perturb0))
    print(f"two_cross_pass:       {ms:8.3f} ms", flush=True)

    # narrow incl. gathers (pv etc. built inside)
    @jax.jit
    def narrow_with_gather(fl_, pairs_):
        i0 = pairs_.qi
        j0 = pairs_.qj
        p = 2e-6 * (fl_.rmax[i0] + fl_.rmax[jnp.minimum(j0, N - 1)])
        return two_cross_pass(
            fl_.verts[i0], fl_.nverts[i0],
            q_verts[j0] + pairs_.shift[:, None, :], q_n[j0], p,
        )
    ms = timeit(lambda: narrow_with_gather(fl, pairs))
    print(f"narrow + gathers:     {ms:8.3f} ms", flush=True)

    # slow path kernel at its capacity
    slow_cap = max(sim.pair_cap // 128, 32)
    iz = jnp.zeros((slow_cap,), jnp.int32)
    reg_fn = jax.jit(
        lambda a, b, c, d, p: jax.vmap(
            lambda aa, bb, cc, dd, pp: intersect_regions(
                aa, bb, cc, dd, CAP=sim.clip_cap, perturb=pp
            )
        )(a, b, c, d, p)
    )
    ms = timeit(
        lambda: reg_fn(
            fl.verts[iz], fl.nverts[iz], q_verts[iz], q_n[iz],
            perturb0[: slow_cap],
        )
    )
    print(f"slow region kernel:   {ms:8.3f} ms  (cap={slow_cap})", flush=True)

    # full collisions
    col_fn = jax.jit(
        lambda f: C.timestep_collisions(
            f, dm, consts, dt, sim.collision_settings, sim.pair_cap,
            sim.clip_cap, sim.bins,
        )
    )
    ms = timeit(lambda: col_fn(fl))
    print(f"collisions total:     {ms:8.3f} ms", flush=True)

    # coupling
    cp_fn = jax.jit(
        lambda f, o: CP.timestep_coupling(
            f, grid, dm, o, atmos, consts, cps, fs, dt, sim.cell_cap
        )
    )
    ms = timeit(lambda: cp_fn(fl, oc))
    print(f"coupling (one-way):   {ms:8.3f} ms", flush=True)

    # coupling with two-way ON (the reference-faithful configuration,
    # shear_flow.jl:35-38)
    cps2 = CouplingSettings(two_way_coupling_on=True)
    cp2_fn = jax.jit(
        lambda f, o: CP.timestep_coupling(
            f, grid, dm, o, atmos, consts, cps2, fs, dt, sim.cell_cap
        )
    )
    ms = timeit(lambda: cp2_fn(fl, oc))
    print(f"coupling (two-way):   {ms:8.3f} ms", flush=True)

    # two-way sub-phases: window clip
    ow = jax.jit(
        lambda f, o: CP.calc_one_way_coupling(f, grid, dm, o, atmos, consts)
    )(fl, oc)
    tw_fn = jax.jit(
        lambda ow_, o: CP.calc_two_way_coupling(
            ow_, grid, dm, o, atmos, consts, fs, dt, sim.cell_cap
        )
    )
    ms = timeit(lambda: tw_fn(ow, oc))
    print(f"  two-way only:       {ms:8.3f} ms  (cell_cap={sim.cell_cap})", flush=True)

    # integrator
    si = jnp.zeros_like(fl.stress_accum)
    uf_fn = jax.jit(lambda f: UF.timestep_floe_properties(f, dt, fs, si))
    ms = timeit(lambda: uf_fn(fl))
    print(f"integrator:           {ms:8.3f} ms", flush=True)

    # removal/dissolve
    from subzero_tpu.physics import simplification as S

    rm_fn = jax.jit(lambda f, o: S.remove_and_dissolve(f, o, grid, dm, fs))
    ms = timeit(lambda: rm_fn(fl, oc))
    print(f"remove/dissolve:      {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
