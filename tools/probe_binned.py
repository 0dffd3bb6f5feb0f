#!/usr/bin/env python
"""TPU probe: binned broad phase under lax.scan at large N.

Validates that the top_k-based binned broad phase (collisions.py:
_find_candidate_pairs_binned) compiles and runs on the TPU runtime inside a
jitted lax.scan - the argsort/offsets formulation it replaced faulted there
- and measures steps/s + candidate pairs/s against the dense broad phase.

Run detached on TPU:
  PYTHONPATH="$PYTHONPATH:/root/repo" nohup /tmp/run_tpu.sh \
      /tmp/probe_binned.out 900 tools/probe_binned.py &
"""

import sys
import time

import numpy as np


def measure(sim, n_steps=20):
    import jax
    import jax.numpy as jnp

    from subzero_tpu.physics.collisions import find_candidate_pairs
    from subzero_tpu.simulation import build_step

    step = build_step(sim)
    model = sim.model
    fl, oc, dm = model.floes, model.ocean, model.domain
    pairs = find_candidate_pairs(fl, dm, sim.pair_cap, sim.bins)
    pairs_per_step = int(jnp.sum(pairs.valid))
    overflow0 = bool(pairs.overflow)

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

    out = run_block(fl, oc, dm, jnp.asarray(1))
    jax.block_until_ready(out[0].centroid)
    t0 = time.perf_counter()
    out = run_block(fl, oc, dm, jnp.asarray(1))
    jax.block_until_ready(out[0].centroid)
    elapsed = time.perf_counter() - t0
    sps = n_steps / elapsed
    return {
        "pairs_per_s": pairs_per_step * sps,
        "steps_per_s": sps,
        "pairs_per_step": pairs_per_step,
        "overflow0": overflow0,
    }


def main():
    import jax

    import bench
    from subzero_tpu.simulation import _auto_bins

    print("device:", jax.devices()[0], flush=True)
    for n, L in [(8000, 4e5)]:
        sim = bench.build_sim(n, L, 2e3, bins=True)
        print(f"N={n}: auto bins = {sim.bins}, pair_cap = {sim.pair_cap}",
              flush=True)
        r = measure(sim)
        print(
            f"N={n} binned: {r['steps_per_s']:.2f} steps/s, "
            f"{r['pairs_per_s']:.0f} pairs/s, "
            f"{r['pairs_per_step']} pairs/step, overflow={r['overflow0']}",
            flush=True,
        )
        # phase breakdown: broad phase alone, then collisions off
        import jax.numpy as jnp
        import time as _t
        from subzero_tpu.physics.collisions import find_candidate_pairs

        fl, dm = sim.model.floes, sim.model.domain

        @jax.jit
        def bp_block(fl):
            def body(carry, k):
                fl = carry
                p = find_candidate_pairs(fl, dm, sim.pair_cap, sim.bins)
                fl = fl._replace(
                    centroid=fl.centroid
                    + (jnp.sum(p.valid) % 2).astype(fl.centroid.dtype) * 1e-30
                )
                return fl, ()
            fl, _ = jax.lax.scan(body, fl, jnp.arange(20))
            return fl
        out = bp_block(fl); jax.block_until_ready(out.centroid)
        t0 = _t.perf_counter()
        out = bp_block(fl); jax.block_until_ready(out.centroid)
        print(f"  broad phase only: {(_t.perf_counter()-t0)/20*1e3:.2f} ms",
              flush=True)

        sim_nc = bench.build_sim(n, L, 2e3, bins=True, collisions=False)
        rnc = measure(sim_nc)
        print(f"  collisions off:  {1e3/rnc['steps_per_s']:.2f} ms/step "
              f"(full {1e3/r['steps_per_s']:.2f})", flush=True)


if __name__ == "__main__":
    main()
