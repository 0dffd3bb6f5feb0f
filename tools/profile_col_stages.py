#!/usr/bin/env python
"""Stage-level scan timing INSIDE timestep_collisions at a given scale.

Times jitted scans that compute progressively more of the collision
pipeline (broad -> +gathers/narrow -> +slow -> +forces -> full), so the
marginal cost of each stage is visible at the scale where it matters.

  PYTHONPATH=...:/root/repo python tools/profile_col_stages.py [n L bins]
"""

import sys

sys.path.insert(0, ".")
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from subzero_tpu.core.domain import wall_rect
    from subzero_tpu.geometry.clip import two_cross_dispatch
    from subzero_tpu.physics import collisions as C

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    L = float(sys.argv[2]) if len(sys.argv) > 2 else 4e5
    use_bins = len(sys.argv) > 3 and sys.argv[3] not in ("0", "")
    sim = bench.build_sim(n, L, 2e3, bins=use_bins)
    fl, dm = sim.model.floes, sim.model.domain
    N = fl.capacity
    V = fl.max_verts
    dtype = fl.verts.dtype
    consts = sim.consts
    print("device:", jax.devices()[0], "N:", N, "pair_cap:", sim.pair_cap,
          "bins:", sim.bins, flush=True)

    def scan_time(body, n_iter=50):
        @jax.jit
        def run(fl0):
            def f(carry, k):
                fl_, acc = carry
                out = body(fl_)
                eps = (out % 2.0).astype(fl_.centroid.dtype) * 1e-30
                fl_ = fl_._replace(centroid=fl_.centroid + eps)
                return (fl_, acc + out), ()
            (fl1, acc), _ = jax.lax.scan(
                f, (fl0, jnp.zeros((), jnp.float32)), jnp.arange(n_iter)
            )
            return acc
        acc = run(fl)
        jax.block_until_ready(acc)
        t0 = time.perf_counter()
        acc = run(fl)
        jax.block_until_ready(acc)
        return (time.perf_counter() - t0) / n_iter * 1e3

    # stage 1: broad phase
    ms = scan_time(lambda f: jnp.sum(
        C.find_candidate_pairs(f, dm, sim.pair_cap, sim.bins).valid
    ).astype(jnp.float32))
    print(f"broad:               {ms:8.3f} ms", flush=True)

    wall_vs, wall_ns = [], []
    for w in range(4):
        wv, wn = wall_rect(dm, w, V, dtype)
        wall_vs.append(wv)
        wall_ns.append(wn)
    q_verts = jnp.concatenate(
        [fl.verts, jnp.stack(wall_vs), dm.topography.verts.astype(dtype)], 0
    )
    q_n = jnp.concatenate(
        [fl.nverts, jnp.stack(wall_ns), dm.topography.nverts], 0
    )

    # stage 2: broad + gathers + narrow
    def s2(f):
        pairs = C.find_candidate_pairs(f, dm, sim.pair_cap, sim.bins)
        i0, j0 = pairs.qi, pairs.qj
        pv0 = f.verts[i0]
        pn0 = f.nverts[i0]
        qv0 = q_verts[j0]
        p = 2e-6 * (f.rmax[i0] + f.rmax[jnp.minimum(j0, N - 1)])
        tc = two_cross_dispatch(
            pv0, pn0, qv0 + pairs.shift[:, None, :], q_n[j0], p
        )
        return jnp.sum(tc.area).astype(jnp.float32)
    ms = scan_time(s2)
    print(f"broad+narrow:        {ms:8.3f} ms", flush=True)

    # stage 3: everything (timestep_collisions)
    def s3(f):
        res = C.timestep_collisions(
            f, dm, consts, float(sim.dt), sim.collision_settings,
            sim.pair_cap, sim.clip_cap, sim.bins,
        )
        return jnp.sum(res.floes.collision_force).astype(jnp.float32)
    ms = scan_time(s3)
    print(f"collisions full:     {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
