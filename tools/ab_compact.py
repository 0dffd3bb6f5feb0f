#!/usr/bin/env python
"""A/B of pair-list compaction before the narrow phase at large N.

  python tools/ab_compact.py [n L kc_mult]

Times a 30-step jitted scan of timestep_collisions with COMPACT_MIN_N
forced on/off (and the compact capacity KC = kc_mult * N).
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
    print("device:", jax.devices()[0], "N:", fl.capacity,
          "pair_cap:", sim.pair_cap, "bins:", sim.bins, flush=True)

    def scan_time(n_iter=30):
        @jax.jit
        def run(fl0):
            def f(carry, k):
                fl_, acc = carry
                res = C.timestep_collisions(
                    fl_, dm, consts, float(sim.dt), sim.collision_settings,
                    sim.pair_cap, sim.clip_cap, sim.bins,
                )
                out = jnp.sum(res.floes.collision_force).astype(jnp.float32)
                eps = (out % 2.0).astype(fl_.centroid.dtype) * 1e-30
                fl_ = fl_._replace(centroid=fl_.centroid + eps)
                return (fl_, acc + out), ()
            (fl1, acc), _ = jax.lax.scan(
                f, (fl0, jnp.zeros((), jnp.float32)), jnp.arange(n_iter)
            )
            return acc
        acc = run(fl)
        jax.block_until_ready(acc)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            acc = run(fl)
            jax.block_until_ready(acc)
            best = min(best, (time.perf_counter() - t0) / n_iter * 1e3)
        return best, float(acc)

    old = C.COMPACT_MIN_N
    ms, chk = scan_time()
    print(f"compact OFF:   {ms:8.3f} ms   (checksum {chk:.6g})", flush=True)
    C.COMPACT_MIN_N = 0
    ms, chk = scan_time()
    print(f"compact ON :   {ms:8.3f} ms   (checksum {chk:.6g})", flush=True)
    C.COMPACT_MIN_N = old


if __name__ == "__main__":
    main()
