#!/usr/bin/env python
"""A/B of the per-floe candidate row budget (pair_cap = k * N) at large N.

The row-structured candidate list pays every narrow-phase gather per
PADDED row: mean contact degree is ~3.5 at conc 0.8 but row_cap was 12.
The _rank_select_rows spill list exists to absorb the rare deep rows, so a
tighter row_cap should shrink PC (= N * row_cap + N/2) and the dominant
two-cross pass with it - as long as overflow stays clean.

  python tools/ab_rowcap.py [n L]
"""

import sys

sys.path.insert(0, ".")
import time


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from subzero_tpu.physics import collisions as C

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    L = float(sys.argv[2]) if len(sys.argv) > 2 else 5.66e5
    sim = bench.build_sim(n, L, 2e3, bins=True)
    fl, dm = sim.model.floes, sim.model.domain
    consts = sim.consts
    N = fl.capacity
    print("device:", jax.devices()[0], "N:", N, "bins:", sim.bins, flush=True)

    def scan_time(pair_cap, n_iter=30):
        @jax.jit
        def run(fl0):
            def f(carry, k):
                fl_, acc, nov = carry
                res = C.timestep_collisions(
                    fl_, dm, consts, float(sim.dt), sim.collision_settings,
                    pair_cap, sim.clip_cap, sim.bins,
                )
                out = jnp.sum(
                    jnp.abs(res.floes.collision_force)
                ).astype(jnp.float32)
                nov = nov + res.overflow.astype(jnp.int32)
                eps = (out % 2.0).astype(fl_.centroid.dtype) * 1e-30
                fl_ = fl_._replace(centroid=fl_.centroid + eps)
                return (fl_, acc + out, nov), ()
            (fl1, acc, nov), _ = jax.lax.scan(
                f, (fl0, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
                jnp.arange(n_iter),
            )
            return acc, nov
        acc, nov = run(fl)
        jax.block_until_ready(acc)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            acc, nov = run(fl)
            jax.block_until_ready(acc)
            best = min(best, (time.perf_counter() - t0) / n_iter * 1e3)
        return best, float(acc), int(nov)

    for k in (12, 8, 6, 5):
        ms, chk, nov = scan_time(k * N)
        print(
            f"pair_cap={k:2d}N: {ms:8.3f} ms  overflow_steps={nov}  "
            f"(checksum {chk:.6g})",
            flush=True,
        )


if __name__ == "__main__":
    main()
