#!/usr/bin/env python
"""Breakdown of calc_two_way_coupling at the 8k bench scale: deposit
contraction, cell clip, per-cell segment_sum, and a matmul-scatter
alternative to the segment_sum, each scan-timed with perturbation."""

import sys
import time

sys.path.insert(0, ".")


def scan_time(body, fl, n_iter=30):
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

    sim = bench.build_sim(8000, 4e5, 2e3)
    m = sim.model
    fl, oc, at, gr, dm = m.floes, m.ocean, m.atmos, m.grid, m.domain
    consts = sim.consts
    cap = sim.cell_cap
    N = fl.capacity
    NCx, NCy = gr.Nx + 1, gr.Ny + 1
    C = NCx * NCy
    print(f"device={jax.devices()[0]} N={N} cap={cap} C={C}", flush=True)

    ow = CPL.calc_one_way_coupling(fl, gr, dm, oc, at, consts)

    def windows(f):
        cx0 = jnp.floor((f.centroid[:, 0] - gr.x0) / gr.dx + 0.5).astype(jnp.int32)
        cy0 = jnp.floor((f.centroid[:, 1] - gr.y0) / gr.dy + 0.5).astype(jnp.int32)
        half = cap // 2
        offs = jnp.arange(cap) - half
        wx = cx0[:, None] + offs[None, :]
        wy = cy0[:, None] + offs[None, :]
        return cx0, cy0, wx, wy

    def t_deposit(f):
        ow_ = ow._replace(floes=f)
        cx0, cy0, _, _ = windows(f)
        half = cap // 2
        pxi = jnp.floor((ow_.pt_x - gr.x0) / gr.dx + 0.5).astype(jnp.int32)
        pyi = jnp.floor((ow_.pt_y - gr.y0) / gr.dy + 0.5).astype(jnp.int32)
        kx = pxi - (cx0[:, None] - half)
        ky = pyi - (cy0[:, None] - half)
        wmask = ow_.pt_mask
        ar = jnp.arange(cap, dtype=jnp.int32)
        ohx = ((kx[:, :, None] == ar) & wmask[:, :, None]).astype(jnp.float32)
        ohy = (ky[:, :, None] == ar).astype(jnp.float32)
        payload = jnp.stack(
            [-ow_.pt_tau_x_ocn, -ow_.pt_tau_y_ocn, jnp.ones_like(ow_.pt_x)],
            axis=-1,
        )
        P = ow_.pt_x.shape[1]
        z = (ohy[:, :, :, None] * payload[:, :, None, :]).reshape(N, P, cap * 3)
        sums = jax.lax.dot_general(
            ohx, z, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.sum(sums).astype(jnp.float32)

    print(f"deposit (new):   {t_deposit.__name__ and scan_time(t_deposit, fl):8.3f} ms", flush=True)

    def t_clip(f):
        _, _, wx, wy = windows(f)
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

    print(f"cell clip:       {scan_time(t_clip, fl):8.3f} ms", flush=True)

    def t_segsum(f):
        _, _, wx, wy = windows(f)
        wxs = jnp.mod(wx, gr.Nx)
        wys = jnp.mod(wy, gr.Ny)
        ixs = jnp.broadcast_to(wxs[:, :, None], (N, cap, cap))
        iys = jnp.broadcast_to(wys[:, None, :], (N, cap, cap))
        cell_flat = ixs * NCy + iys
        w = f.area[:, None, None] * jnp.ones((N, cap, cap), jnp.float32)
        pay = jnp.stack([w, 2 * w, 3 * w], -1).reshape(-1, 3)
        s = jax.ops.segment_sum(pay, cell_flat.reshape(-1), num_segments=C)
        return jnp.sum(s).astype(jnp.float32)

    print(f"segsum [NW,3]:   {scan_time(t_segsum, fl):8.3f} ms", flush=True)

    def t_matscatter(f):
        _, _, wx, wy = windows(f)
        wxs = jnp.mod(wx, gr.Nx)
        wys = jnp.mod(wy, gr.Ny)
        w = f.area[:, None, None] * jnp.ones((N, cap, cap), jnp.float32)
        pay = jnp.stack([w, 2 * w, 3 * w], -1)  # [N, cap, cap, 3]
        # A[n, gx, a] = 1[gx == wxs[n, a]] ; step1 = A^T pay over a
        gx = jnp.arange(NCx, dtype=jnp.int32)
        A = (wxs[:, None, :] == gx[None, :, None]).astype(jnp.float32)
        step1 = jax.lax.dot_general(
            A, pay.reshape(N, cap, cap * 3),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [N, NCx, cap*3]
        gy = jnp.arange(NCy, dtype=jnp.int32)
        B = (wys[:, None, :] == gy[None, :, None]).astype(jnp.float32)  # [N, NCy, cap]
        # out[gx, gy, f] = sum_{n, b} step1[n, gx, b, f] * B[n, gy, b]
        L = step1.reshape(N, NCx, cap, 3)
        out = jnp.einsum("ngbf,nhb->ghf", L, B)
        return jnp.sum(out).astype(jnp.float32)

    print(f"matmul scatter:  {scan_time(t_matscatter, fl):8.3f} ms", flush=True)

    # correctness cross-check segsum vs matscatter
    _, _, wx, wy = windows(fl)
    wxs = jnp.mod(wx, gr.Nx)
    wys = jnp.mod(wy, gr.Ny)
    w = fl.area[:, None, None] * jnp.ones((N, cap, cap), jnp.float32)
    pay = jnp.stack([w, 2 * w, 3 * w], -1)
    ixs = jnp.broadcast_to(wxs[:, :, None], (N, cap, cap))
    iys = jnp.broadcast_to(wys[:, None, :], (N, cap, cap))
    cell_flat = (ixs * NCy + iys).reshape(-1)
    s1 = jax.ops.segment_sum(pay.reshape(-1, 3), cell_flat, num_segments=C)
    gx = jnp.arange(NCx, dtype=jnp.int32)
    A = (wxs[:, None, :] == gx[None, :, None]).astype(jnp.float32)
    step1 = jax.lax.dot_general(
        A, pay.reshape(N, cap, cap * 3), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(N, NCx, cap, 3)
    B = (wys[:, None, :] == jnp.arange(NCy, dtype=jnp.int32)[None, :, None]).astype(jnp.float32)
    s2 = jnp.einsum("ngbf,nhb->ghf", step1, B).reshape(C, 3)
    import numpy as np

    rel = float(jnp.max(jnp.abs(s1 - s2)) / (jnp.max(jnp.abs(s1)) + 1e-30))
    print(f"segsum vs matscatter max rel diff: {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
