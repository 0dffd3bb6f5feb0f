#!/usr/bin/env python
"""Where do the non-collision non-coupling milliseconds go at N=8016?

Scan-times (perturbed): an empty body (scan/carry floor at this state
size), update_floe alone, +wrap, +remove_and_dissolve, and the full
build_step with collisions and coupling off.
"""

import sys
import time

sys.path.insert(0, ".")


def scan_time(body, fl, oc, n_iter=30):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(fl0, oc0):
        def f(carry, k):
            fl_, oc_, acc = carry
            fl2, oc2, out = body(fl_, oc_)
            eps = (out % 2.0).astype(fl_.centroid.dtype) * 1e-30
            fl2 = fl2._replace(centroid=fl2.centroid + eps)
            return (fl2, oc2, acc + out), ()

        (fl1, oc1, acc), _ = jax.lax.scan(
            f, (fl0, oc0, jnp.zeros((), jnp.float32)), jnp.arange(n_iter)
        )
        return acc

    acc = run(fl, oc)
    jax.block_until_ready(acc)
    t0 = time.perf_counter()
    acc = run(fl, oc)
    jax.block_until_ready(acc)
    return (time.perf_counter() - t0) / n_iter * 1e3


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from subzero_tpu.physics import simplification as S
    from subzero_tpu.physics import update_floe as U
    from subzero_tpu.simulation import build_step

    sim = bench.build_sim(8000, 4e5, 2e3, bins=True)
    m = sim.model
    fl, oc, gr, dm = m.floes, m.ocean, m.grid, m.domain
    fs = sim.floe_settings
    dt = float(sim.dt)
    print("device:", jax.devices()[0], flush=True)

    def empty(f, o):
        return f, o, jnp.sum(f.u).astype(jnp.float32)

    print(f"empty body:        {scan_time(empty, fl, oc):8.3f} ms", flush=True)

    si = jnp.zeros_like(fl.stress_accum)

    def upd(f, o):
        f2 = U.timestep_floe_properties(f, dt, fs, si)
        return f2, o, jnp.sum(f2.u).astype(jnp.float32)

    print(f"update_floe:       {scan_time(upd, fl, oc):8.3f} ms", flush=True)

    def updwrap(f, o):
        f2 = U.timestep_floe_properties(f, dt, fs, si)
        f2 = U.wrap_periodic(f2, dm)
        return f2, o, jnp.sum(f2.u).astype(jnp.float32)

    print(f"+wrap_periodic:    {scan_time(updwrap, fl, oc):8.3f} ms", flush=True)

    def full_finish(f, o):
        f2 = U.timestep_floe_properties(f, dt, fs, si)
        f2 = U.wrap_periodic(f2, dm)
        f2, o2 = S.remove_and_dissolve(f2, o, gr, dm, fs)
        return f2, o2, jnp.sum(f2.u).astype(jnp.float32)

    print(f"+remove_dissolve:  {scan_time(full_finish, fl, oc):8.3f} ms", flush=True)

    sim2 = bench.build_sim(8000, 4e5, 2e3, bins=True, coupling=False,
                           collisions=False)
    step = build_step(sim2)

    def stp(f, o):
        f2, o2, _, _ = step(f, o, dm, jnp.asarray(5))
        return f2, o2, jnp.sum(f2.u).astype(jnp.float32)

    print(f"step (no col/cpl): {scan_time(stp, fl, oc):8.3f} ms", flush=True)

    # composed pipelines: where does the whole-program penalty come from?
    from subzero_tpu.physics import collisions as C

    def col_only(f, o):
        res = C.timestep_collisions(
            f, dm, sim.consts, dt, sim.collision_settings, sim.pair_cap,
            sim.clip_cap, sim.bins,
        )
        return res.floes, o, jnp.sum(res.floes.collision_force).astype(jnp.float32)

    print(f"collisions only:   {scan_time(col_only, fl, oc):8.3f} ms", flush=True)

    def col_finish(f, o):
        res = C.timestep_collisions(
            f, dm, sim.consts, dt, sim.collision_settings, sim.pair_cap,
            sim.clip_cap, sim.bins,
        )
        f2 = U.timestep_floe_properties(res.floes, dt, fs, res.stress_instant)
        f2 = U.wrap_periodic(f2, dm)
        f2, o2 = S.remove_and_dissolve(f2, o, gr, dm, fs)
        return f2, o2, jnp.sum(f2.u).astype(jnp.float32)

    print(f"col+finish:        {scan_time(col_finish, fl, oc):8.3f} ms", flush=True)

    step_full = build_step(sim)

    def stp_full(f, o):
        f2, o2, _, _ = step_full(f, o, dm, jnp.asarray(5))
        return f2, o2, jnp.sum(f2.u).astype(jnp.float32)

    print(f"full step (cpl@10):{scan_time(stp_full, fl, oc):8.3f} ms", flush=True)

    sim3 = bench.build_sim(8000, 4e5, 2e3, bins=True, coupling=False)
    step_nc = build_step(sim3)

    def stp_nc(f, o):
        f2, o2, _, _ = step_nc(f, o, dm, jnp.asarray(5))
        return f2, o2, jnp.sum(f2.u).astype(jnp.float32)

    print(f"full step (no cpl):{scan_time(stp_nc, fl, oc):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
