#!/usr/bin/env python
"""Coupling-phase timings at bench configs (one-way / two-way / deposition
one-hot / cell clip), at N=500 and N=8000.  Scan-timed with per-iteration
perturbation (loop-invariant bodies get hoisted) and enough iterations to
amortize the dispatch fixed cost.

  nohup /tmp/run_tpu.sh /tmp/prof_cpl.log 2400 tools/profile_coupling.py &
"""

import sys
import time

sys.path.insert(0, ".")


def scan_time(body, fl, n_iter):
    import jax
    import jax.numpy as jnp

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


def profile_config(n, L, n_iter):
    import jax
    import jax.numpy as jnp

    import bench
    from subzero_tpu.physics import coupling as CPL

    sim = bench.build_sim(n, L, 2e3)
    m = sim.model
    fl, oc, at, gr, dm = m.floes, m.ocean, m.atmos, m.grid, m.domain
    consts, fs = sim.consts, sim.floe_settings
    cap = sim.cell_cap
    print(
        f"--- N={fl.capacity} P={fl.sub_x.shape[1]} cell_cap={cap} "
        f"grid={gr.Nx}x{gr.Ny} n_iter={n_iter}",
        flush=True,
    )

    def oneway(f):
        r = CPL.calc_one_way_coupling(f, gr, dm, oc, at, consts)
        return jnp.sum(r.floes.fx_oa).astype(jnp.float32)

    print(f"one-way:        {scan_time(oneway, fl, n_iter):8.3f} ms", flush=True)

    def full(f):
        r = CPL.timestep_coupling(
            f, gr, dm, oc, at, consts, sim.coupling_settings, fs,
            float(sim.dt), cap,
        )
        return jnp.sum(r[1].tau_x).astype(jnp.float32)

    print(f"full coupling:  {scan_time(full, fl, n_iter):8.3f} ms", flush=True)

    def twoway_only(f):
        ow = CPL.calc_one_way_coupling(f, gr, dm, oc, at, consts)
        o2, _ = CPL.calc_two_way_coupling(
            ow, gr, dm, oc, at, consts, fs, float(sim.dt), cap
        )
        return (jnp.sum(o2.tau_x) - jnp.sum(ow.floes.fx_oa) * 0.0).astype(
            jnp.float32
        )

    def deposit(f):
        ow_ = CPL.calc_one_way_coupling(f, gr, dm, oc, at, consts)
        cx0 = jnp.floor((f.centroid[:, 0] - gr.x0) / gr.dx + 0.5).astype(jnp.int32)
        cy0 = jnp.floor((f.centroid[:, 1] - gr.y0) / gr.dy + 0.5).astype(jnp.int32)
        half = cap // 2
        pxi = jnp.floor((ow_.pt_x - gr.x0) / gr.dx + 0.5).astype(jnp.int32)
        pyi = jnp.floor((ow_.pt_y - gr.y0) / gr.dy + 0.5).astype(jnp.int32)
        kx = pxi - (cx0[:, None] - half)
        ky = pyi - (cy0[:, None] - half)
        in_win = (kx >= 0) & (kx < cap) & (ky >= 0) & (ky < cap)
        wmask = ow_.pt_mask & in_win
        CW = cap * cap
        dtypef = ow_.pt_x.dtype
        wk = jnp.where(wmask, kx * cap + ky, CW)
        onehot = (
            wk[:, :, None] == jnp.arange(CW, dtype=wk.dtype)[None, None, :]
        ).astype(dtypef)
        payload = jnp.stack(
            [
                jnp.where(wmask, -ow_.pt_tau_x_ocn, 0.0),
                jnp.where(wmask, -ow_.pt_tau_y_ocn, 0.0),
                wmask.astype(dtypef),
            ],
            axis=-1,
        )
        sums = jax.lax.dot_general(
            onehot, payload, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=dtypef,
        )
        return jnp.sum(sums).astype(jnp.float32)

    ow1 = scan_time(oneway, fl, n_iter)
    print(f"  two-way part: {scan_time(twoway_only, fl, n_iter) - ow1:8.3f} ms"
          " (full minus its one-way, approx)", flush=True)
    print(f"  ow+deposit:   {scan_time(deposit, fl, n_iter) - ow1:8.3f} ms",
          flush=True)


def main():
    import jax

    print("device:", jax.devices()[0], flush=True)
    profile_config(500, 1e5, 200)
    profile_config(8000, 4e5, 30)


if __name__ == "__main__":
    main()
