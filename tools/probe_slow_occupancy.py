"""How often does the slow (general-region) tier fire, and with how many
rows?  Used to bound the cost of the sliver tolerance + parity-retry
choices (geometry/clip.py SLIVER_TOL_*, collisions.py retry_slow).

Run on TPU:
    nohup /tmp/run_tpu.sh /tmp/probe_slow.out 1800 tools/probe_slow_occupancy.py <n_floes> &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(n_floes=8000, n_steps=60):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from subzero_tpu.physics import collisions as C
    from subzero_tpu.simulation import build_step

    print("device:", jax.devices()[0], "n_floes:", n_floes, flush=True)
    sim = bench.build_sim(n_floes, 4e5 * (n_floes / 8000) ** 0.5, 2e3,
                          bins=n_floes >= 6000)
    step = build_step(sim)
    consts, cls, dt = sim.consts, sim.collision_settings, float(sim.dt)

    @jax.jit
    def dbg_fn(floes, domain):
        _, dbg = C.timestep_collisions(
            floes, domain, consts, dt, cls, sim.pair_cap, sim.clip_cap,
            sim.bins, with_debug=True,
        )
        return dbg["n_slow"], dbg["n_parity_bad"]

    floes, ocean, domain = sim.model.floes, sim.model.ocean, sim.model.domain
    n_slow_hist, n_bad_hist = [], []
    t0 = time.time()
    for k in range(n_steps):
        ns, nb = dbg_fn(floes, domain)
        n_slow_hist.append(int(ns))
        n_bad_hist.append(int(nb))
        floes, ocean, domain, ov = step(floes, ocean, domain, jnp.asarray(k))
    h = np.asarray(n_slow_hist)
    b = np.asarray(n_bad_hist)
    print(
        f"{n_steps} steps in {time.time() - t0:.1f}s: "
        f"slow-tier fired on {(h > 0).sum()} steps; "
        f"n_slow mean {h.mean():.1f} p50 {np.percentile(h, 50):.0f} "
        f"p95 {np.percentile(h, 95):.0f} max {h.max()}; "
        f"parity-bad on {(b > 0).sum()} steps (mean {b.mean():.2f})",
        flush=True,
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8000)
