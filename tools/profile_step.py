#!/usr/bin/env python
"""Phase-level timing of one full simulation step on the current device.

Builds the same 500-floe shear_flow-style field as bench.py and times each
phase of build_step separately (each phase jitted on its own), so we know
where the step's milliseconds go before optimizing.

Run detached on TPU:
  nohup python tools/profile_step.py > /tmp/profile_step.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, args, n=30, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


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
    from subzero_tpu.geometry.clip import intersect_regions, two_cross_pass
    from subzero_tpu.physics import collisions as C
    from subzero_tpu.physics import simplification as S
    from subzero_tpu.physics import update_floe as U
    from subzero_tpu.physics import coupling as CP
    from subzero_tpu.settings import (
        CollisionSettings,
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
    cls = CollisionSettings()
    sim = Simulation(
        model=model, consts=consts, dt=20, n_dt=0,
        floe_settings=fs, coupling_settings=cps,
    )
    dt = 20.0
    fl, oc, dm = model.floes, model.ocean, model.domain
    N = fl.capacity
    V = fl.max_verts
    print(f"device={jax.devices()[0]} N={N} V={V} pair_cap={sim.pair_cap} "
          f"cell_cap={sim.cell_cap} bins={sim.bins}", flush=True)

    # --- phase functions, each jitted on its own -------------------------
    f_broad = jax.jit(lambda f: C.find_candidate_pairs(f, dm, sim.pair_cap))
    pairs = f_broad(fl)
    print(f"candidate pairs: {int(jnp.sum(pairs.valid))}", flush=True)

    from subzero_tpu.core.domain import wall_rect

    wall_vs, wall_ns = [], []
    for w in range(4):
        wv, wn = wall_rect(dm, w, V, dtype)
        wall_vs.append(wv)
        wall_ns.append(wn)
    q_verts = jnp.concatenate(
        [fl.verts, jnp.stack(wall_vs), dm.topography.verts.astype(dtype)], 0
    )
    q_n = jnp.concatenate(
        [fl.nverts, jnp.stack(wall_ns), dm.topography.nverts], 0
    )

    @jax.jit
    def f_fused(f, pr):
        i0, j0 = pr.qi, pr.qj
        scale0 = f.rmax[i0] + f.rmax[jnp.minimum(j0, N - 1)]
        return two_cross_pass(
            f.verts[i0], f.nverts[i0],
            q_verts[j0] + pr.shift[:, None, :], q_n[j0],
            2e-6 * scale0,
        )

    cc = max(sim.pair_cap // 32, 32)

    @jax.jit
    def f_narrow(f, pr):
        i0 = pr.qi[:cc]
        j0 = pr.qj[:cc]
        scale0 = f.rmax[i0] + f.rmax[jnp.minimum(j0, N - 1)]
        return jax.vmap(
            lambda a, b, c, d, p: intersect_regions(a, b, c, d, CAP=16, perturb=p)
        )(
            f.verts[i0], f.nverts[i0],
            q_verts[j0] + pr.shift[:cc, None, :],
            q_n[j0],
            2e-6 * scale0,
        )

    f_null = jax.jit(lambda f: f.u + 1.0)

    f_collide = jax.jit(
        lambda f: C.timestep_collisions(
            f, dm, consts, dt, cls, sim.pair_cap, sim.clip_cap, sim.bins
        )
    )
    f_couple = jax.jit(
        lambda f, o: CP.timestep_coupling(
            f, grid, dm, o, atmos, consts, cps, fs, dt, sim.cell_cap
        )
    )
    res0 = f_collide(fl)
    f_update = jax.jit(
        lambda f, si: U.timestep_floe_properties(f, dt, fs, si)
    )
    f_wrap = jax.jit(lambda f: U.wrap_periodic(f, dm))
    f_rm = jax.jit(lambda f, o: S.remove_and_dissolve(f, o, grid, dm, fs))
    step = build_step(sim)

    @jax.jit
    def f_scan10(f, o, d):
        def body(carry, ts):
            fl_, oc_, dm_ = carry
            fl_, oc_, dm_, _ = step(fl_, oc_, dm_, ts)
            return (fl_, oc_, dm_), None

        (f2, o2, d2), _ = jax.lax.scan(body, (f, o, d), jnp.arange(1, 11))
        return f2

    t_null = timeit(f_null, (fl,), n=50)
    t_broad = timeit(f_broad, (fl,))
    t_fused = timeit(f_fused, (fl, pairs))
    t_narrow = timeit(f_narrow, (fl, pairs))
    t_collide = timeit(f_collide, (fl,))
    t_couple = timeit(f_couple, (fl, oc))
    t_update = timeit(f_update, (fl, res0.stress_instant))
    t_wrap = timeit(f_wrap, (fl,))
    t_rm = timeit(f_rm, (fl, oc))
    t_step = timeit(lambda f, o, d: step(f, o, d, jnp.asarray(1)), (fl, oc, dm))
    t_scan = timeit(f_scan10, (fl, oc, dm), n=10)

    for name, t in [
        ("null dispatch", t_null),
        ("broad_phase", t_broad),
        ("fused two_cross_pass[pair_cap]", t_fused),
        (f"slow_intersect_regions[{cc}]", t_narrow),
        ("timestep_collisions (total)", t_collide),
        ("timestep_coupling", t_couple),
        ("timestep_floe_properties", t_update),
        ("wrap_periodic", t_wrap),
        ("remove_and_dissolve", t_rm),
        ("FULL STEP (single dispatch)", t_step),
        ("FULL STEP (scan, per step)", t_scan / 10.0),
    ]:
        print(f"{name:42s} {t * 1e3:9.3f} ms", flush=True)


if __name__ == "__main__":
    main()
