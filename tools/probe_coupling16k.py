#!/usr/bin/env python
"""Coupling cost breakdown at large N on the current device.

The 16k-floe step spends ~10 ms/step amortized in coupling (cadence 10 ->
~100 ms per invocation).  This scan-times the real pipeline pieces:

  * _bilinear interpolation alone ([N, P] points, 5 stacked fields)
  * calc_one_way_coupling (interp + drag recipe)
  * two-way deposit contraction + exact cell clip + grid matmul scatter
  * timestep_coupling end-to-end

  PYTHONPATH="$PYTHONPATH:/root/repo" python tools/probe_coupling16k.py [n L]
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from subzero_tpu.physics import coupling as CPL

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    L = float(sys.argv[2]) if len(sys.argv) > 2 else 5.66e5
    sim = bench.build_sim(n, L, 2e3, bins=True)
    m = sim.model
    fl, oc, at, gr, dm = m.floes, m.ocean, m.atmos, m.grid, m.domain
    consts = sim.consts
    cap = sim.cell_cap
    N = fl.capacity
    P = fl.sub_x.shape[1]
    NCx, NCy = gr.Nx + 1, gr.Ny + 1
    print(
        f"device={jax.devices()[0]} N={N} P={P} cell_cap={cap} "
        f"grid={NCx}x{NCy}", flush=True,
    )

    def scan_time(body, n_iter=20):
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
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = run(fl)
            jax.block_until_ready(acc)
            best = min(best, time.perf_counter() - t0)
        return best / n_iter * 1e3

    # interpolation alone
    stacked = jnp.stack([at.u, at.v, oc.u, oc.v, oc.hflx_factor], axis=-1)

    def t_interp(f):
        ca = jnp.cos(f.alpha)[:, None]
        sa = jnp.sin(f.alpha)[:, None]
        px = ca * f.sub_x - sa * f.sub_y + f.centroid[:, 0:1]
        py = sa * f.sub_x + ca * f.sub_y + f.centroid[:, 1:2]
        vals = CPL._bilinear(stacked, px, py, gr, dm.ew_periodic,
                             dm.ns_periodic)
        return jnp.sum(vals).astype(jnp.float32)

    print(f"bilinear interp [N,P,5]: {scan_time(t_interp):8.3f} ms",
          flush=True)

    def t_oneway(f):
        ow = CPL.calc_one_way_coupling(f, gr, dm, oc, at, consts)
        return jnp.sum(ow.floes.fx_oa).astype(jnp.float32)

    print(f"one-way total:           {scan_time(t_oneway):8.3f} ms",
          flush=True)

    # interp + drag recipe, no per-floe reductions
    def t_drag(f):
        ca = jnp.cos(f.alpha)[:, None]
        sa = jnp.sin(f.alpha)[:, None]
        px = ca * f.sub_x - sa * f.sub_y + f.centroid[:, 0:1]
        py = sa * f.sub_x + ca * f.sub_y + f.centroid[:, 1:2]
        vals = CPL._bilinear(stacked, px, py, gr, dm.ew_periodic,
                             dm.ns_periodic)
        uatm, vatm, uocn, vocn, hflx = (vals[..., k] for k in range(5))
        xc = px - f.centroid[:, 0:1]
        yc = py - f.centroid[:, 1:2]
        upoint = f.u[:, None] - f.xi[:, None] * yc
        vpoint = f.v[:, None] + f.xi[:, None] * xc
        du_ai = uatm - upoint
        dv_ai = vatm - vpoint
        nrm_a = jnp.sqrt(du_ai**2 + dv_ai**2)
        tx = consts.rho_a * consts.Cd_ia * nrm_a * du_ai
        du_oi = uocn - upoint
        dv_oi = vocn - vpoint
        nrm_o = jnp.sqrt(du_oi**2 + dv_oi**2)
        tx = tx + consts.rho_o * consts.Cd_io * nrm_o * du_oi
        return jnp.sum(tx).astype(jnp.float32)

    print(f"  interp+drag, no sums:  {scan_time(t_drag):8.3f} ms",
          flush=True)

    # hypothesis: XLA duplicates the interp gathers into every consumer
    # fusion (remat); a barrier forces one materialization
    def t_drag_barrier(f):
        ca = jnp.cos(f.alpha)[:, None]
        sa = jnp.sin(f.alpha)[:, None]
        px = ca * f.sub_x - sa * f.sub_y + f.centroid[:, 0:1]
        py = sa * f.sub_x + ca * f.sub_y + f.centroid[:, 1:2]
        vals = CPL._bilinear(stacked, px, py, gr, dm.ew_periodic,
                             dm.ns_periodic)
        vals = jax.lax.optimization_barrier(vals)
        uatm, vatm, uocn, vocn, hflx = (vals[..., k] for k in range(5))
        xc = px - f.centroid[:, 0:1]
        yc = py - f.centroid[:, 1:2]
        upoint = f.u[:, None] - f.xi[:, None] * yc
        vpoint = f.v[:, None] + f.xi[:, None] * xc
        du_ai = uatm - upoint
        dv_ai = vatm - vpoint
        nrm_a = jnp.sqrt(du_ai**2 + dv_ai**2)
        tx = consts.rho_a * consts.Cd_ia * nrm_a * du_ai
        du_oi = uocn - upoint
        dv_oi = vocn - vpoint
        nrm_o = jnp.sqrt(du_oi**2 + dv_oi**2)
        tx = tx + consts.rho_o * consts.Cd_io * nrm_o * du_oi
        return jnp.sum(tx).astype(jnp.float32)

    print(f"  interp+drag, barrier:  {scan_time(t_drag_barrier):8.3f} ms",
          flush=True)

    def t_oneway_pts(f):
        ow = CPL.calc_one_way_coupling(f, gr, dm, oc, at, consts)
        # pull on the per-point outputs instead of the floe sums
        return (jnp.sum(ow.pt_tau_x_ocn) + jnp.sum(ow.floes.fx_oa)).astype(
            jnp.float32
        )

    print(f"one-way total+points:    {scan_time(t_oneway_pts):8.3f} ms",
          flush=True)

    ow0 = CPL.calc_one_way_coupling(fl, gr, dm, oc, at, consts)

    def t_twoway(f):
        ow = ow0._replace(floes=f)
        oc2, _ = CPL.calc_two_way_coupling(
            ow, gr, dm, oc, at, consts, sim.floe_settings, float(sim.dt), cap
        )
        return jnp.sum(oc2.tau_x).astype(jnp.float32)

    print(f"two-way total:           {scan_time(t_twoway):8.3f} ms",
          flush=True)

    def t_cellareas(f):
        cx0 = jnp.floor(
            (f.centroid[:, 0] - gr.x0) / gr.dx + 0.5
        ).astype(jnp.int32)
        cy0 = jnp.floor(
            (f.centroid[:, 1] - gr.y0) / gr.dy + 0.5
        ).astype(jnp.int32)
        offs = jnp.arange(cap) - cap // 2
        *_, w_area = CPL._floe_cell_areas(f, gr, dm, cap, cx0, cy0, offs)
        return jnp.sum(w_area).astype(jnp.float32)

    print(f"  cell clip areas:       {scan_time(t_cellareas):8.3f} ms",
          flush=True)

    def t_full(f):
        f2, oc2, ov = CPL.timestep_coupling(
            f, gr, dm, oc, at, consts, sim.coupling_settings,
            sim.floe_settings, float(sim.dt), cap,
        )
        return jnp.sum(oc2.tau_x).astype(jnp.float32)

    print(f"timestep_coupling full:  {scan_time(t_full):8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
