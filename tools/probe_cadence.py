#!/usr/bin/env python
"""Does the coupling lax.cond actually skip work at cadence?

Times the full jitted step under scan with coupling OFF, every step
(dt=1), and at cadence (dt=10).  If cond works: dt10 = off + (dt1-off)/10.
If cond was select-converted: dt10 = dt1.
"""

import dataclasses
import sys

sys.path.insert(0, ".")


def blocked_measure(sim_on, sim_off, n_blocks=10, cdt=10):
    """Cond-free cadence: scan over blocks of (1 coupled step + cdt-1
    uncoupled steps), built from two step functions.  What the cadence
    cond SHOULD cost if it were free."""
    import time

    import jax
    import jax.numpy as jnp

    from subzero_tpu.simulation import build_step

    step_on = build_step(sim_on)    # coupling dt=1: couples every tstep
    step_off = build_step(sim_off)  # coupling off
    m = sim_on.model
    fl, oc, dm = m.floes, m.ocean, m.domain

    @jax.jit
    def run_block(fl, oc, dm):
        def blk(carry, t0):
            fl, oc, dm = carry
            fl, oc, dm, _ = step_on(fl, oc, dm, t0)

            def inner(c, t):
                fl, oc, dm = c
                fl, oc, dm, _ = step_off(fl, oc, dm, t)
                return (fl, oc, dm), None

            (fl, oc, dm), _ = jax.lax.scan(
                inner, (fl, oc, dm), t0 + 1 + jnp.arange(cdt - 1)
            )
            return (fl, oc, dm), None

        (fl, oc, dm), _ = jax.lax.scan(
            blk, (fl, oc, dm), 1 + cdt * jnp.arange(n_blocks)
        )
        return fl, oc, dm

    r = run_block(fl, oc, dm)
    jax.block_until_ready(r[0].centroid)
    t0 = time.perf_counter()
    r = run_block(fl, oc, dm)
    jax.block_until_ready(r[0].centroid)
    return (time.perf_counter() - t0) / (n_blocks * cdt) * 1e3


def main():
    import jax

    import bench

    for n, L, use_bins, nst in ((500, 1e5, False, 200), (8000, 4e5, True, 20)):
        rows = {}
        sims = {}
        for tag, kw in (("off", dict(coupling=False)), ("dt1", {}), ("dt10", {})):
            sim = bench.build_sim(n, L, 2e3, bins=use_bins, **kw)
            if tag == "dt1":
                sim.coupling_settings = dataclasses.replace(
                    sim.coupling_settings, dt=1
                )
            sims[tag] = sim
            r = bench.measure(sim, n_steps=nst)
            rows[tag] = r["step_ms"]
            print(f"N={n} coupling={tag}: step {r['step_ms']} ms", flush=True)
        occ = rows["dt1"] - rows["off"]
        pred_cond = rows["off"] + occ / 10
        blocked = blocked_measure(
            sims["dt1"], sims["off"], n_blocks=max(nst // 10, 2)
        )
        print(
            f"N={n}: occurrence={occ:.2f} ms, predicted-if-cond-free "
            f"{pred_cond:.2f}, measured cond dt10 {rows['dt10']:.2f}, "
            f"blocked(cond-free) {blocked:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
