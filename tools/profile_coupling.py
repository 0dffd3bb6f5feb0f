#!/usr/bin/env python
"""Coupling-phase timings at bench configs, plus 8000-step phase toggles.

Times (scan of 20 iterations, jitted):
  * one-way coupling alone
  * full two-way coupling (one-way + deposition + cell clip + assembly)
  * the [N,P,CW] one-hot deposition contraction alone
  * the [N,cap,cap] clamped-shoelace cell clip alone
at the shear_flow_500 scale, then whole-step phase toggles at 8000.

  nohup /tmp/run_tpu.sh /tmp/prof_cpl.log 2400 tools/profile_coupling.py &
"""

import sys
import time

sys.path.insert(0, ".")


def scan_time(body, fl, n_iter=20):
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


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from subzero_tpu.physics import coupling as CPL

    sim = bench.build_sim(500, 1e5, 2e3)
    m = sim.model
    fl, oc, at, gr, dm = m.floes, m.ocean, m.atmos, m.grid, m.domain
    consts, fs = sim.consts, sim.floe_settings
    cap = sim.cell_cap
    print(
        f"device={jax.devices()[0]} N={fl.capacity} P={fl.sub_x.shape[1]} "
        f"cell_cap={cap} grid={gr.Nx}x{gr.Ny}",
        flush=True,
    )

    def oneway(f):
        r = CPL.calc_one_way_coupling(f, gr, dm, oc, at, consts)
        return jnp.sum(r.floes.fx_oa).astype(jnp.float32)

    print(f"one-way:        {scan_time(oneway, fl):8.3f} ms", flush=True)

    def full(f):
        r = CPL.timestep_coupling(
            f, gr, dm, oc, at, consts, sim.coupling_settings, fs,
            float(sim.dt), cap,
        )
        return jnp.sum(r[1].tau_x).astype(jnp.float32)

    print(f"full coupling:  {scan_time(full, fl):8.3f} ms", flush=True)

    ow = CPL.calc_one_way_coupling(fl, gr, dm, oc, at, consts)

    def deposit(f):
        ow_ = ow._replace(floes=f)
        N, P = ow_.pt_x.shape
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

    print(f"  deposit 1hot: {scan_time(deposit, fl):8.3f} ms", flush=True)

    def cellclip(f):
        N = f.capacity
        cx0 = jnp.floor((f.centroid[:, 0] - gr.x0) / gr.dx + 0.5).astype(jnp.int32)
        cy0 = jnp.floor((f.centroid[:, 1] - gr.y0) / gr.dy + 0.5).astype(jnp.int32)
        half = cap // 2
        offs = jnp.arange(cap) - half
        wx = cx0[:, None] + offs[None, :]
        wy = cy0[:, None] + offs[None, :]
        xmin = (wx[:, :, None] - 0.5) * gr.dx + gr.x0
        xmax = xmin + gr.dx
        ymin = (wy[:, None, :] - 0.5) * gr.dy + gr.y0
        ymax = ymin + gr.dy
        xmin = jnp.broadcast_to(xmin, (N, cap, cap))
        xmax = jnp.broadcast_to(xmax, (N, cap, cap))
        ymin = jnp.broadcast_to(ymin, (N, cap, cap))
        ymax = jnp.broadcast_to(ymax, (N, cap, cap))
        ok = jnp.broadcast_to(f.active[:, None, None], (N, cap, cap))
        area = CPL._clip_area_to_rects(
            f.verts[:, :16], f.nverts, xmin, xmax, ymin, ymax, ok
        )
        return jnp.sum(area).astype(jnp.float32)

    print(f"  cell clip:    {scan_time(cellclip, fl):8.3f} ms", flush=True)

    # ---- 8000 phase toggles ------------------------------------------------
    for name, kw in (
        ("8000 full", {}),
        ("8000 no-coupling", dict(coupling=False)),
        ("8000 no-collisions", dict(collisions=False)),
    ):
        sim8 = bench.build_sim(8000, 4e5, 2e3, bins=True, **kw)
        r = bench.measure(sim8, n_steps=20)
        print(f"{name}: step {r['step_ms']} ms", flush=True)


if __name__ == "__main__":
    main()
