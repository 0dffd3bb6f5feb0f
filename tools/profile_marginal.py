#!/usr/bin/env python
"""Marginal per-phase cost inside the exact bench loop.

Runs the bench's full-state lax.scan (bench.py:measure) for the full step
and for variants with one phase disabled (collisions off / coupling off /
integrator only), on the same 500-floe shear_flow state.  The difference
from the full step is the phase's true marginal cost in context - immune
to the DCE / loop-invariant-hoisting artifacts that make isolated probes
misleading (see tools/profile_scan.py vs tools/profile_step.py).

  PYTHONPATH="$PYTHONPATH:/root/repo" nohup python tools/profile_marginal.py \
      [n L n_steps bins] > /tmp/profile_marginal.out 2>&1 &
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from subzero_tpu.settings import CollisionSettings, CouplingSettings
    from subzero_tpu.simulation import build_step

    def measure(sim, n_steps=100):
        step = build_step(sim)
        m = sim.model
        fl, oc, dm = m.floes, m.ocean, m.domain

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
        return (time.perf_counter() - t0) / n_steps * 1e3

    print("device:", jax.devices()[0], flush=True)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    L = float(sys.argv[2]) if len(sys.argv) > 2 else 1e5
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    use_bins = len(sys.argv) > 4 and sys.argv[4] not in ("0", "")
    base = bench.build_sim(n, L, 2e3, bins=use_bins)

    def measure(sim, _measure=measure):  # bind the chosen scan length
        return _measure(sim, n_steps=n_steps)

    ms_full = measure(base)
    print(f"full step:            {ms_full:8.3f} ms", flush=True)

    import copy

    s = copy.copy(base)
    s.collision_settings = CollisionSettings(collisions_on=False)
    ms = measure(s)
    print(f"collisions off:       {ms:8.3f} ms   (marginal {ms_full - ms:.3f})", flush=True)

    s = copy.copy(base)
    s.coupling_settings = CouplingSettings(coupling_on=False)
    ms = measure(s)
    print(f"coupling off:         {ms:8.3f} ms   (marginal {ms_full - ms:.3f})", flush=True)

    s = copy.copy(base)
    s.collision_settings = CollisionSettings(collisions_on=False)
    s.coupling_settings = CouplingSettings(coupling_on=False)
    ms = measure(s)
    print(f"integrate+remove only:{ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
