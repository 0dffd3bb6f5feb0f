#!/usr/bin/env python
"""Bisect where the fused full-step milliseconds go, by timing scan-10 of
progressively larger slices of the step (each slice folds a scalar back into
the carry so XLA cannot dead-code it).

Run detached on TPU:
  nohup python tools/bisect_step.py > /tmp/bisect_step.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, args, n=20, warmup=2):
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
    from subzero_tpu.core.domain import wall_rect
    from subzero_tpu.geometry.clip import intersect_regions, two_cross_pass
    from subzero_tpu.physics import collisions as C
    from subzero_tpu.physics import simplification as S
    from subzero_tpu.physics import update_floe as U
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
    nv = np.asarray(fl.nverts)[np.asarray(fl.active)]
    print(
        f"device={jax.devices()[0]} N={N} V={V} pair_cap={sim.pair_cap} "
        f"nverts: mean={nv.mean():.1f} p50={np.percentile(nv, 50):.0f} "
        f"p90={np.percentile(nv, 90):.0f} max={nv.max()}",
        flush=True,
    )

    wall_vs, wall_ns = [], []
    for w in range(4):
        wv, wn = wall_rect(dm, w, V, dtype)
        wall_vs.append(wv)
        wall_ns.append(wn)
    q_verts_tail = jnp.stack(wall_vs)
    q_n_tail = jnp.stack(wall_ns)

    def scan10(body):
        @jax.jit
        def run(f):
            def b(carry, ts):
                return body(carry, ts), None

            out, _ = jax.lax.scan(b, f, jnp.arange(1, 11))
            return out

        return run

    def fold(f, x):
        # fold a scalar into the carry so nothing is DCE'd
        return f._replace(u=f.u + 0.0 * jnp.sum(x))

    # ---- slices ----------------------------------------------------------
    def body_broad(f, ts):
        pairs = C.find_candidate_pairs(f, dm, sim.pair_cap)
        return fold(f, pairs.shift)

    def mk_fast(f, pairs):
        q_verts = jnp.concatenate([f.verts, q_verts_tail], 0)
        q_n = jnp.concatenate([f.nverts, q_n_tail], 0)
        i0, j0 = pairs.qi, pairs.qj
        scale0 = f.rmax[i0] + f.rmax[jnp.minimum(j0, N - 1)]
        return two_cross_pass(
            f.verts[i0], f.nverts[i0],
            q_verts[j0] + pairs.shift[:, None, :], q_n[j0],
            2e-6 * scale0,
        )

    def body_broad_fast(f, ts):
        pairs = C.find_candidate_pairs(f, dm, sim.pair_cap)
        tc = mk_fast(f, pairs)
        return fold(f, tc.area)

    def body_broad_fast_slow(f, ts):
        pairs = C.find_candidate_pairs(f, dm, sim.pair_cap)
        tc = mk_fast(f, pairs)
        PC = pairs.qi.shape[0]
        slow_cap = max(sim.pair_cap // 128, 32)
        slow_mask = pairs.valid & (tc.cnt > 0) & ~tc.ok
        (ssel,) = jnp.nonzero(slow_mask, size=slow_cap, fill_value=PC)
        ssafe = jnp.minimum(ssel, PC - 1)
        q_verts = jnp.concatenate([f.verts, q_verts_tail], 0)
        q_n = jnp.concatenate([f.nverts, q_n_tail], 0)
        i1 = pairs.qi[ssafe]
        j1 = pairs.qj[ssafe]
        scale1 = f.rmax[i1] + f.rmax[jnp.minimum(j1, N - 1)]
        sregions = jax.vmap(
            lambda a, b, c, d, p: intersect_regions(a, b, c, d, CAP=16, perturb=p)
        )(
            f.verts[i1], f.nverts[i1],
            q_verts[j1] + pairs.shift[ssafe][:, None, :], q_n[j1],
            2e-6 * scale1,
        )
        return fold(fold(f, tc.area), sregions.total_area)

    def body_collide(f, ts):
        res = C.timestep_collisions(
            f, dm, consts, dt, cls, sim.pair_cap, sim.clip_cap, sim.bins
        )
        return fold(res.floes, res.stress_instant)

    def mk_sides_regions(f, pairs, tc):
        import jax.numpy as jnp2

        PC = pairs.qi.shape[0]
        q_verts = jnp.concatenate([f.verts, q_verts_tail], 0)
        q_n = jnp.concatenate([f.nverts, q_n_tail], 0)
        T = dm.topography.count
        wall_cent = jnp.zeros((4, 2), dtype)
        q_cent = jnp.concatenate(
            [f.centroid, wall_cent, dm.topography.centroid.astype(dtype)], 0
        )
        q_table = C._q_table(f, dm, q_n, q_cent, dtype)
        row_cap = PC // N
        sides = C._gather_sides(f, q_table, pairs.qi, pairs.qj, row_cap=row_cap)
        R1 = 1
        fast_regions = C.ClipRegions(
            total_area=tc.area,
            area=tc.area[:, None],
            centroid=tc.centroid[:, None, :],
            n_cross=jnp.full((PC, R1), 2, jnp.int32),
            chord_a=tc.chord_a[:, None, :],
            chord_b=tc.chord_b[:, None, :],
            p_norm=tc.p_norm[:, None, :],
            p_len=jnp.zeros((PC, R1), dtype),
            p_cnt=jnp.zeros((PC, R1), jnp.int32),
            q_cnt=jnp.zeros((PC, R1), jnp.int32),
            valid=(pairs.valid & tc.ok & (tc.area > 0))[:, None],
            overflow=jnp.asarray(False),
        )
        return sides, fast_regions, row_cap

    def body_broad_fast_forces(f, ts):
        pairs = C.find_candidate_pairs(f, dm, sim.pair_cap)
        tc = mk_fast(f, pairs)
        sides, fast_regions, row_cap = mk_sides_regions(f, pairs, tc)
        f_force, f_fp, f_rec = C._region_forces(
            consts, dt, dm.vals, sides, pairs.shift, fast_regions,
            pairs.valid & tc.ok,
        )
        return fold(fold(f, tc.area), f_force)

    def body_broad_fast_forces_acc(f, ts):
        pairs = C.find_candidate_pairs(f, dm, sim.pair_cap)
        tc = mk_fast(f, pairs)
        sides, fast_regions, row_cap = mk_sides_regions(f, pairs, tc)
        f_force, f_fp, f_rec = C._region_forces(
            consts, dt, dm.vals, sides, pairs.shift, fast_regions,
            pairs.valid & tc.ok,
        )
        acc = C._accumulate_contacts(
            N, pairs.qi, pairs.qj, sides, pairs.valid,
            sides.is_floe_j & pairs.valid, pairs.shift,
            f_force, f_fp, f_rec, row_cap=row_cap,
        )
        return fold(fold(f, acc[0]), acc[2])

    def body_tail(f, ts):
        # everything after collisions (coupling off in this config's cadence)
        si = jnp.zeros_like(f.stress_accum)
        f = U.timestep_floe_properties(f, dt, fs, si)
        f = U.wrap_periodic(f, dm)
        f, _ = S.remove_and_dissolve(f, oc, grid, dm, fs)
        return f

    step = build_step(sim)

    def body_full(f, ts):
        f2, _, _, _ = step(f, oc, dm, ts)
        return f2

    variants = [
        ("broad only", body_broad),
        ("broad + fast narrow", body_broad_fast),
        ("broad + fast + slow narrow", body_broad_fast_slow),
        ("broad + fast + forces", body_broad_fast_forces),
        ("broad + fast + forces + acc", body_broad_fast_forces_acc),
        ("timestep_collisions (all)", body_collide),
        ("integrate+wrap+remove (tail)", body_tail),
        ("FULL STEP", body_full),
    ]
    for name, body in variants:
        t = timeit(scan10(body), (fl,), n=10) / 10.0
        print(f"{name:36s} {t * 1e3:9.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
