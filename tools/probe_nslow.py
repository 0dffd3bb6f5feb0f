#!/usr/bin/env python
"""How many candidate pairs need the general region kernel after the
field evolves?  Evolves the 8k bench sim 50 steps, then counts crossing
histogram + slow-mask size at the evolved state; also times 64 rows of
intersect_regions standalone."""

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from subzero_tpu.core.domain import wall_rect
    from subzero_tpu.geometry.clip import two_cross_dispatch, intersect_regions
    from subzero_tpu.physics import collisions as C
    from subzero_tpu.simulation import build_step

    print("device:", jax.devices()[0], flush=True)
    sim = bench.build_sim(8000, 4e5, 2e3, bins=True)
    m = sim.model
    fl, oc, dm = m.floes, m.ocean, m.domain
    step = build_step(sim)

    @jax.jit
    def evolve(fl, oc, dm):
        def body(c, t):
            fl, oc, dm = c
            fl, oc, dm, _ = step(fl, oc, dm, t)
            return (fl, oc, dm), None

        (fl, oc, dm), _ = jax.lax.scan(body, (fl, oc, dm), 1 + jnp.arange(50))
        return fl, oc, dm

    fl, oc, dm = evolve(fl, oc, dm)
    jax.block_until_ready(fl.centroid)

    N = fl.capacity
    V = fl.max_verts
    dtype = fl.verts.dtype
    pairs = C.find_candidate_pairs(fl, dm, sim.pair_cap, sim.bins)
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
    i0, j0 = pairs.qi, pairs.qj
    p = 2e-6 * (fl.rmax[i0] + fl.rmax[jnp.minimum(j0, N - 1)])
    tc = two_cross_dispatch(
        fl.verts[i0], fl.nverts[i0],
        q_verts[j0] + pairs.shift[:, None, :], q_n[j0], p,
    )
    cnt = jnp.where(pairs.valid, tc.cnt, 0)
    import numpy as np

    cnts = np.asarray(cnt)
    print("valid pairs:", int(jnp.sum(pairs.valid)),
          "touching (cnt>0):", int((cnts > 0).sum()),
          "cnt==2:", int((cnts == 2).sum()),
          "cnt==4:", int((cnts == 4).sum()),
          "cnt>=6:", int((cnts >= 6).sum()), flush=True)
    slow = np.asarray(pairs.valid & (cnt > 0) & ~tc.ok)
    print("slow rows (".strip(), slow.sum(), "), of which cnt==2-but-not-ok:",
          int((slow & (cnts == 2)).sum()), flush=True)

    # standalone cost of 64 general-kernel rows at this state
    idx = np.nonzero(slow)[0]
    if len(idx) == 0:
        idx = np.arange(64)
    sel = jnp.asarray(np.resize(idx, 64))

    @jax.jit
    def run64(fl):
        def body(acc, k):
            regs = jax.vmap(
                lambda a, b, c, d, pp: intersect_regions(
                    a, b, c, d, CAP=sim.clip_cap, perturb=pp
                )
            )(
                fl.verts[i0[sel]] + acc * 1e-30,
                fl.nverts[i0[sel]],
                q_verts[j0[sel]] + pairs.shift[sel][:, None, :],
                q_n[j0[sel]],
                p[sel],
            )
            return acc + jnp.sum(regs.total_area) * 1e-30, ()

        acc, _ = jax.lax.scan(body, jnp.zeros((), dtype), jnp.arange(30))
        return acc

    acc = run64(fl)
    jax.block_until_ready(acc)
    t0 = time.perf_counter()
    jax.block_until_ready(run64(fl))
    print(f"64-row general kernel: {(time.perf_counter() - t0) / 30 * 1e3:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
