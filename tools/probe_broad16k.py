#!/usr/bin/env python
"""DCE-staged breakdown of the BINNED broad phase at large N.

probe_narrow16k.py showed the narrow-phase pieces (packed j-gather +
two_cross kernel + accumulate) cost ~5 ms of the 18 ms
timestep_collisions at N=16k while DCE->overflow (broad+prefilter+slow)
is 16.4 ms: the binned broad phase dominates.  This probe times its
internal stages separately:

  * bin assignment + argsort + per-bin member tables     (sort infra)
  * the four [N,9] row-block gathers of bin tables       (suspect: ~144k
    row gathers; TPU row gathers are issue-rate bound)
  * mask build (min-image fold + circle test) given gathers
  * _rank_select_rows alone on a precomputed mask
  * column->pair mapping (take_along_axis block)
  * find_candidate_pairs end-to-end

  PYTHONPATH="$PYTHONPATH:/root/repo" python tools/probe_broad16k.py [n L]
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from subzero_tpu.physics import collisions as C

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    L = float(sys.argv[2]) if len(sys.argv) > 2 else 5.66e5
    sim = bench.build_sim(n, L, 2e3, bins=True)
    fl, dm = sim.model.floes, sim.model.domain
    nbx, nby, M = sim.bins
    N = fl.capacity
    dtype = fl.verts.dtype
    print(f"device: {jax.devices()[0]} N={N} bins={sim.bins} "
          f"pair_cap={sim.pair_cap}", flush=True)

    def scan_time(body, n_iter=30):
        @jax.jit
        def run(fl0):
            def f(carry, k):
                fl_, acc = carry
                out = body(fl_)
                eps = (out % 2.0).astype(dtype) * 1e-30
                fl_ = fl_._replace(centroid=fl_.centroid + eps)
                return (fl_, acc + out), ()

            (_, acc), _ = jax.lax.scan(
                f, (fl0, jnp.zeros((), jnp.float32)), jnp.arange(n_iter)
            )
            return acc

        acc = run(fl)
        jax.block_until_ready(acc)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = run(fl)
            jax.block_until_ready(acc)
            best = min(best, time.perf_counter() - t0)
        return best / n_iter * 1e3

    from subzero_tpu.core.domain import WEST, SOUTH, EAST, NORTH

    w_val = float(dm.vals[WEST])
    s_val = float(dm.vals[SOUTH])
    Lx = float(dm.vals[EAST]) - w_val
    Ly = float(dm.vals[NORTH]) - s_val
    bx, by = Lx / nbx, Ly / nby
    NB = nbx * nby

    def bin_tables(f):
        c, r, act = f.centroid, f.rmax, f.active
        ibx = jnp.clip(jnp.floor((c[:, 0] - w_val) / bx).astype(jnp.int32),
                       0, nbx - 1)
        iby = jnp.clip(jnp.floor((c[:, 1] - s_val) / by).astype(jnp.int32),
                       0, nby - 1)
        bin_id = jnp.where(act, ibx * nby + iby, NB)
        order = jnp.argsort(bin_id)
        counts = jax.ops.segment_sum(
            jnp.ones((N,), jnp.int32), bin_id, num_segments=NB + 1
        )[:NB]
        start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(counts)[:-1].astype(jnp.int32)]
        )
        kk = jnp.arange(M, dtype=jnp.int32)
        flat = start[:, None] + kk[None, :]
        mem_valid = kk[None, :] < counts[:, None]
        mem_sel = jnp.where(mem_valid, order[jnp.minimum(flat, N - 1)], N)
        return ibx, iby, mem_sel, mem_valid

    print(f"sort+member tables:        "
          f"{scan_time(lambda f: jnp.sum(bin_tables(f)[2]).astype(jnp.float32)):8.3f} ms",
          flush=True)

    ibx0, iby0, mem_sel0, mem_valid0 = jax.jit(bin_tables)(fl)
    mem_safe0 = jnp.minimum(mem_sel0, N - 1)
    offs = jnp.asarray([-1, 0, 1])

    def nb_ids(f):
        ibx = jnp.clip(jnp.floor((f.centroid[:, 0] - w_val) / bx)
                       .astype(jnp.int32), 0, nbx - 1)
        iby = jnp.clip(jnp.floor((f.centroid[:, 1] - s_val) / by)
                       .astype(jnp.int32), 0, nby - 1)
        nx_idx = jnp.mod(ibx[:, None, None] + offs[None, :, None], nbx)
        ny_idx = jnp.mod(iby[:, None, None] + offs[None, None, :], nby)
        return (nx_idx * nby + ny_idx).reshape(N, 9)

    # the four [N,9] row-block gathers on FIXED bin tables
    cm0 = jnp.where(mem_valid0[..., None], fl.centroid[mem_safe0], 0.0)
    rm0 = jnp.where(mem_valid0, fl.rmax[mem_safe0], 0.0)

    def t_gathers(f):
        nb = nb_ids(f)
        slot_ok = mem_valid0[nb]
        j_cand = jnp.minimum(mem_sel0[nb], N - 1)
        c_cand = cm0[nb]
        r_cand = rm0[nb]
        return (jnp.sum(c_cand) + jnp.sum(r_cand)
                + jnp.sum(j_cand).astype(dtype)
                + jnp.sum(slot_ok).astype(dtype)).astype(jnp.float32)

    print(f"4x [N,9] bin-row gathers:  {scan_time(t_gathers):8.3f} ms",
          flush=True)

    def t_gather_ccand(f):
        nb = nb_ids(f)
        return jnp.sum(cm0[nb]).astype(jnp.float32)

    print(f"  c_cand gather alone:     {scan_time(t_gather_ccand):8.3f} ms",
          flush=True)

    # packed variant: one [NB, M, 4] table -> one [N,9] row gather
    packed0 = jnp.concatenate(
        [cm0, rm0[..., None],
         jnp.where(mem_valid0, mem_sel0, N).astype(dtype)[..., None]],
        axis=-1,
    )

    def t_gather_packed(f):
        nb = nb_ids(f)
        return jnp.sum(packed0[nb]).astype(jnp.float32)

    print(f"  packed [NB,M,4] gather:  {scan_time(t_gather_packed):8.3f} ms",
          flush=True)

    # mask build from pre-gathered candidate tensors
    nb0 = jax.jit(nb_ids)(fl)
    slot_ok0 = mem_valid0[nb0]
    j_cand0 = jnp.minimum(mem_sel0[nb0], N - 1)
    c_cand0 = cm0[nb0]
    r_cand0 = rm0[nb0]
    iidx = jnp.arange(N)[:, None, None]

    def t_mask(f):
        c, r = f.centroid, f.rmax
        dx = c[:, 0][:, None, None] - c_cand0[..., 0]
        dy = c[:, 1][:, None, None] - c_cand0[..., 1]
        if dm.ew_periodic:
            dx = dx - jnp.where(jnp.abs(dx) > Lx / 2, jnp.sign(dx) * Lx, 0.0)
        if dm.ns_periodic:
            dy = dy - jnp.where(jnp.abs(dy) > Ly / 2, jnp.sign(dy) * Ly, 0.0)
        rsum = r[:, None, None] + r_cand0
        mask = (
            slot_ok0
            & f.active[:, None, None]
            & ((((iidx + j_cand0) % 2) == 0) == (iidx < j_cand0))
            & (iidx != j_cand0)
            & (dx * dx + dy * dy < rsum * rsum)
        )
        return jnp.sum(mask).astype(jnp.float32)

    print(f"mask build (given gathers):{scan_time(t_mask):8.3f} ms",
          flush=True)

    # rank-select alone on a fixed mask
    fw, ft = C._wall_topo_masks(fl, dm)
    T = dm.topography.count
    CFF = 9 * M
    C2 = CFF + 4 + T
    # rebuild the full mask once, eagerly
    c, r = fl.centroid, fl.rmax
    dx = c[:, 0][:, None, None] - c_cand0[..., 0]
    dy = c[:, 1][:, None, None] - c_cand0[..., 1]
    if dm.ew_periodic:
        dx = dx - jnp.where(jnp.abs(dx) > Lx / 2, jnp.sign(dx) * Lx, 0.0)
    if dm.ns_periodic:
        dy = dy - jnp.where(jnp.abs(dy) > Ly / 2, jnp.sign(dy) * Ly, 0.0)
    rsum = r[:, None, None] + r_cand0
    ffmask = (
        slot_ok0
        & fl.active[:, None, None]
        & ((((iidx + j_cand0) % 2) == 0) == (iidx < j_cand0))
        & (iidx != j_cand0)
        & (dx * dx + dy * dy < rsum * rsum)
    )
    full_mask0 = jnp.concatenate([ffmask.reshape(N, CFF), fw, ft], axis=1)
    row_cap = max(min(sim.pair_cap // max(N, 1), C2), 8)
    E = C._extra_cap(N)

    def t_rank(f):
        fm = full_mask0 ^ (f.active[:, None] & False)  # keep dependency
        sel, valid, ovf, epos = C._rank_select_rows(fm, row_cap, extra_cap=E)
        return (jnp.sum(sel) + jnp.sum(epos)).astype(jnp.float32)

    print(f"rank-select rows alone:    {scan_time(t_rank):8.3f} ms",
          flush=True)

    sel0, valid0, _, epos0 = jax.jit(
        lambda m: C._rank_select_rows(m, row_cap, extra_cap=E)
    )(full_mask0)

    def t_colmap(f):
        jc = j_cand0.reshape(N, CFF) + (f.active[:1, None] & False)
        selg = jnp.minimum(sel0, CFF + 3 + T)
        j_ff = jnp.take_along_axis(jc, jnp.minimum(selg, CFF - 1), axis=1)
        return jnp.sum(j_ff).astype(jnp.float32)

    print(f"column->pair take_along:   {scan_time(t_colmap):8.3f} ms",
          flush=True)

    def t_full(f):
        p = C.find_candidate_pairs(f, dm, sim.pair_cap, sim.bins)
        return (jnp.sum(p.qj) + jnp.sum(p.valid)).astype(jnp.float32)

    print(f"find_candidate_pairs full: {scan_time(t_full):8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
