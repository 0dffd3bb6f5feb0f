#!/usr/bin/env python
"""Decompose the binned narrow-phase cost at large N on the current device.

The narrow phase processes PC = row_cap*N + extra padded candidate rows:
  * j-side row gathers   q_verts[j0] ([PC,16,2]) + q_table[j0] ([PC,9])
  * the fused two-crossing kernel (Pallas on TPU)
  * the force recipe + accumulation (segment sums / reshape reductions)

TPU row gathers are issue-rate bound (~70 ns/row measured round 3), so the
padded row count - not the valid pair count - sets their cost.  This probe
scan-times each term separately so optimization goes at the real bottleneck:

  PYTHONPATH="$PYTHONPATH:/root/repo" python tools/probe_narrow16k.py [n L]
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from subzero_tpu.core.domain import wall_rect
    from subzero_tpu.geometry.clip import two_cross_dispatch
    from subzero_tpu.physics import collisions as C

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    L = float(sys.argv[2]) if len(sys.argv) > 2 else 5.66e5
    sim = bench.build_sim(n, L, 2e3, bins=True)
    fl, dm = sim.model.floes, sim.model.domain
    N = fl.capacity
    V = fl.max_verts
    dtype = fl.verts.dtype
    print("device:", jax.devices()[0], "N:", N, "pair_cap:", sim.pair_cap,
          "bins:", sim.bins, flush=True)

    pairs = C.find_candidate_pairs(fl, dm, sim.pair_cap, sim.bins)
    PC = int(pairs.qi.shape[0])
    nvalid = int(jnp.sum(pairs.valid))
    print(f"PC rows: {PC}  valid: {nvalid}", flush=True)

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
    NQ = int(q_verts.shape[0])
    j0 = pairs.qj
    i0 = pairs.qi

    def scan_time(body, n_iter=40):
        # vary the index arrays per iteration (roll by 1) so gathers cannot
        # be hoisted out of the loop as loop-invariant
        @jax.jit
        def run(j_in):
            def f(carry, k):
                j, acc = carry
                out = body(j)
                j = jnp.roll(j, 1)
                return (j, acc + out), ()
            (_, acc), _ = jax.lax.scan(
                f, (j_in, jnp.zeros((), jnp.float32)), jnp.arange(n_iter)
            )
            return acc
        acc = run(j0)
        jax.block_until_ready(acc)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = run(j0)
            jax.block_until_ready(acc)
            best = min(best, time.perf_counter() - t0)
        return best / n_iter * 1e3

    ms = scan_time(lambda j: jnp.sum(q_verts[j]).astype(jnp.float32))
    print(f"gather q_verts[j]  [{PC},16,2]: {ms:8.3f} ms", flush=True)

    qt = C._q_table(fl, dm, q_n, jnp.concatenate(
        [fl.centroid, jnp.zeros((4, 2), dtype),
         dm.topography.centroid.astype(dtype)], 0), dtype)
    ms = scan_time(lambda j: jnp.sum(qt[j]).astype(jnp.float32))
    print(f"gather q_table[j]  [{PC},9]:    {ms:8.3f} ms", flush=True)

    # both in one packed gather: [NQ, 41] table
    packed = jnp.concatenate([q_verts.reshape(NQ, 2 * V), qt], axis=1)
    ms = scan_time(lambda j: jnp.sum(packed[j]).astype(jnp.float32))
    print(f"gather packed[j]   [{PC},{int(packed.shape[1])}]:   {ms:8.3f} ms",
          flush=True)

    # kernel on pre-gathered data (i side broadcast, j side fixed)
    E = C._extra_cap(N)
    row_cap = (PC - E) // N
    R0 = N * row_cap
    pv0 = jnp.broadcast_to(
        fl.verts[:, None], (N, row_cap, V, 2)
    ).reshape(R0, V, 2)
    pv0 = jnp.concatenate([pv0, fl.verts[i0[R0:]]], axis=0)
    pn0 = jnp.broadcast_to(fl.nverts[:, None], (N, row_cap)).reshape(R0)
    pn0 = jnp.concatenate([pn0, fl.nverts[i0[R0:]]], axis=0)
    qv0 = q_verts[j0] + pairs.shift[:, None, :]
    qn0 = q_n[j0]
    perturb = 2e-6 * (fl.rmax[i0] + fl.rmax[jnp.minimum(j0, N - 1)])

    def kern(j):
        # shift qv by a tiny per-iter epsilon so the kernel can't be hoisted
        eps = (j[0] % 2).astype(dtype) * 1e-30
        tc = two_cross_dispatch(pv0, pn0, qv0 + eps, qn0, perturb)
        return jnp.sum(tc.area).astype(jnp.float32)
    ms = scan_time(kern)
    print(f"two_cross kernel only [{PC}]:   {ms:8.3f} ms", flush=True)

    # valid-only compacted kernel: same kernel on ~valid rows
    KC = 1 << (nvalid - 1).bit_length()
    (csel,) = jnp.nonzero(pairs.valid, size=KC, fill_value=PC)
    csafe = jnp.minimum(csel, PC - 1)

    def kern_compact(j):
        pv = fl.verts[i0[csafe]]
        pn = fl.nverts[i0[csafe]]
        qv = q_verts[j[csafe]] + pairs.shift[csafe][:, None, :]
        tc = two_cross_dispatch(pv, pn, qv, q_n[j[csafe]], perturb[csafe])
        return jnp.sum(tc.area).astype(jnp.float32)
    ms = scan_time(kern_compact)
    print(f"gathers+kernel on compacted [{KC}]: {ms:8.3f} ms", flush=True)

    # force recipe + accumulation on the fast-path contact list
    from subzero_tpu.geometry.clip import ClipRegions

    q_cent = jnp.concatenate(
        [fl.centroid, jnp.zeros((4, 2), dtype),
         dm.topography.centroid.astype(dtype)], 0)
    qt_full = C._q_table(fl, dm, q_n, q_cent, dtype)
    E2 = C._extra_cap(N)
    rc = (PC - E2) // N
    tc0 = two_cross_dispatch(
        q_verts[i0], fl.nverts[jnp.minimum(i0, N - 1)],
        q_verts[j0] + pairs.shift[:, None, :], q_n[j0], perturb)

    def t_forces(j):
        sides = C._gather_sides(fl, qt_full, i0, j, row_cap=rc, n_rows=N)
        regions = ClipRegions(
            total_area=tc0.area, area=tc0.area[:, None],
            centroid=tc0.centroid[:, None, :],
            n_cross=jnp.full((PC, 1), 2, jnp.int32),
            chord_a=tc0.chord_a[:, None, :], chord_b=tc0.chord_b[:, None, :],
            p_norm=tc0.p_norm[:, None, :],
            p_len=jnp.zeros((PC, 1), dtype),
            p_cnt=jnp.zeros((PC, 1), jnp.int32),
            q_cnt=jnp.zeros((PC, 1), jnp.int32),
            valid=(pairs.valid & (tc0.area > 0))[:, None],
            overflow=jnp.asarray(False),
        )
        on = pairs.valid & tc0.ok
        force, fp, rec = C._region_forces(
            sim.consts, float(sim.dt), dm.vals, sides, pairs.shift,
            regions, on)
        acc = C._accumulate_contacts(
            N, i0, j, sides, pairs.valid, (j < N) & pairs.valid,
            pairs.shift, force, fp, rec, row_cap=rc, n_rows=N)
        return jnp.sum(acc[0]).astype(jnp.float32)

    ms = scan_time(t_forces)
    print(f"forces+accumulate  [{PC}]:     {ms:8.3f} ms", flush=True)

    def t_accum_only(j):
        sides = C._gather_sides(fl, qt_full, i0, j, row_cap=rc, n_rows=N)
        force = jnp.stack([tc0.area, tc0.area], -1)[:, None, :]
        fp = tc0.centroid[:, None, :]
        rec = tc0.area[:, None]
        acc = C._accumulate_contacts(
            N, i0, j, sides, pairs.valid, (j < N) & pairs.valid,
            pairs.shift, force, fp, rec, row_cap=rc, n_rows=N)
        return jnp.sum(acc[0]).astype(jnp.float32)

    ms = scan_time(t_accum_only)
    print(f"gather+accumulate only [{PC}]: {ms:8.3f} ms", flush=True)

    # timestep_collisions staged via DCE: consuming only part of the result
    # lets XLA dead-code-eliminate the downstream stages, so differences
    # locate cost inside the real fused program
    def run_col(j):
        return C.timestep_collisions(
            fl._replace(centroid=fl.centroid + (j[0] % 2).astype(dtype)
                        * 1e-30),
            dm, sim.consts, float(sim.dt), sim.collision_settings,
            sim.pair_cap, sim.clip_cap, sim.bins)

    ms = scan_time(lambda j: jnp.sum(
        run_col(j).overflow.astype(jnp.float32)))
    print(f"col DCE->overflow (broad+narrow+slow): {ms:8.3f} ms", flush=True)

    ms = scan_time(lambda j: jnp.sum(run_col(j).floes.overarea).astype(
        jnp.float32))
    print(f"col DCE->overarea (+forces+accum):     {ms:8.3f} ms", flush=True)

    ms = scan_time(lambda j: jnp.sum(run_col(j).floes.fuse_with).astype(
        jnp.float32))
    print(f"col DCE->fuse marks:                   {ms:8.3f} ms", flush=True)

    def t_full(j):
        res = run_col(j)
        return (jnp.sum(res.floes.collision_force)
                + jnp.sum(res.stress_instant)
                + jnp.sum(res.floes.collision_trq)
                + res.overflow.astype(dtype)).astype(jnp.float32)

    ms = scan_time(t_full)
    print(f"timestep_collisions full:      {ms:8.3f} ms", flush=True)

    dbg = C.timestep_collisions(
        fl, dm, sim.consts, float(sim.dt), sim.collision_settings,
        sim.pair_cap, sim.clip_cap, sim.bins, with_debug=True)[1]
    print("state:", {k: int(v) for k, v in dbg.items()}, flush=True)


if __name__ == "__main__":
    main()
