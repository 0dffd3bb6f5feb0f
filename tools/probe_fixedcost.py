#!/usr/bin/env python
"""Separate the per-step cost from the per-dispatch fixed cost (tunnel
round-trip + launch) by timing the same jitted scan at several lengths.

step_ms(n) = c + F/n  =>  fit c, F from n = {25, 50, 200, 400}.
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from subzero_tpu.simulation import build_step

    sim = bench.build_sim(500, 1e5, 2e3)
    step = build_step(sim)
    m = sim.model
    fl, oc, dm = m.floes, m.ocean, m.domain
    print("device:", jax.devices()[0], flush=True)

    import numpy as np

    xs, ys = [], []
    for n in (25, 50, 200, 400):
        @jax.jit
        def run_block(fl, oc, dm, t0):
            def body(carry, t):
                fl, oc, dm = carry
                fl, oc, dm, _ = step(fl, oc, dm, t)
                return (fl, oc, dm), None

            (fl, oc, dm), _ = jax.lax.scan(
                body, (fl, oc, dm), t0 + jnp.arange(n)
            )
            return fl, oc, dm

        r = run_block(fl, oc, dm, jnp.asarray(1))
        jax.block_until_ready(r[0].centroid)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = run_block(fl, oc, dm, jnp.asarray(1))
            jax.block_until_ready(r[0].centroid)
            best = min(best, time.perf_counter() - t0)
        ms = best / n * 1e3
        xs.append(1.0 / n)
        ys.append(ms)
        print(f"n={n:4d}: {ms:8.4f} ms/step", flush=True)

    A = np.stack([np.ones(len(xs)), np.asarray(xs)], axis=1)
    c, F = np.linalg.lstsq(A, np.asarray(ys), rcond=None)[0]
    print(f"fit: per-step {c:.4f} ms + fixed {F:.2f} ms/dispatch", flush=True)


if __name__ == "__main__":
    main()
