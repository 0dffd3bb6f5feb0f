"""Which collision capacity overflows during the shear_flow anchor run?

The anchor (tools/e2e_shear_flow.py) reported ~46/5000 steps with
pair/crossing overflow and raising pair_cap did NOT clear it, so the
binding capacity must be one of: candidate rows (pairs.overflow), the
compacted list (compact_overflow), the slow-tier row count
(n_slow > slow_cap), or the general kernel's crossing capacity
(sregions.overflow, clip_cap).  This probe steps the anchor config with
``timestep_collisions(with_debug=True)`` alongside the normal step and
prints the counters whenever the flag fires.

Run on TPU:
    nohup /tmp/run_tpu.sh /tmp/probe_ov.out 1800 tools/probe_overflow_source.py &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def main(n_steps=2000):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from shear_flow import build
    from subzero_tpu.physics import collisions as C
    from subzero_tpu.simulation import build_step

    print("device:", jax.devices()[0], flush=True)
    sim = build(n_dt=n_steps, out_dir=None)
    sim.pair_cap = 16 * sim.model.floes.capacity
    sim.clip_cap = 32
    step = build_step(sim)
    consts = sim.consts
    cls = sim.collision_settings
    dt = float(sim.dt)

    @jax.jit
    def dbg_fn(floes, domain):
        _, dbg = C.timestep_collisions(
            floes, domain, consts, dt, cls, sim.pair_cap, sim.clip_cap,
            sim.bins, with_debug=True,
        )
        return dbg

    floes, ocean, domain = (
        sim.model.floes, sim.model.ocean, sim.model.domain
    )
    t0 = time.time()
    hits = {}
    for k in range(n_steps):
        dbg = dbg_fn(floes, domain)
        floes, ocean, domain, ov = step(floes, ocean, domain, jnp.asarray(k))
        if bool(ov):
            d = {kk: np.asarray(v).item() for kk, v in dbg.items()}
            print(f"step {k}: {d}", flush=True)
            for kk in ("pairs_overflow", "compact_overflow", "clip_overflow"):
                hits[kk] = hits.get(kk, 0) + int(d[kk])
            hits["slow"] = hits.get("slow", 0) + int(d["n_slow"] > d["slow_cap"])
    print(f"{n_steps} steps in {time.time() - t0:.1f}s; overflow hits: {hits}",
          flush=True)


if __name__ == "__main__":
    main()
