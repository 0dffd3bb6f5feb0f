"""Pallas TPU kernel for the fused two-crossing narrow phase.

``two_cross_pass`` (geometry/clip.py) is the collision hot loop: for every
broad-phase candidate pair it computes the proper boundary-crossing count,
containment area, and - for the dominant single-region contacts - the full
region quantities.  As stock XLA it is HBM-bandwidth bound: the [V, W, B]
crossing sweep materializes ~25 intermediate tensors (134 MB each at
B = 128k), so a 0.8 GFLOP computation costs tens of milliseconds.  This
kernel runs the whole pipeline per B-tile inside VMEM: traffic drops to the
10 input planes + 1 output plane (~90 MB total at B = 128k).

Layout: the pair axis rides the 128-wide lane dimension; ring vertices
(V = W = 16) ride sublanes.  Per P-edge iteration the kernel evaluates the
crossing test against all 16 Q-edges as one [16, TB] VPU op.

Same math, same operation order as two_cross_pass - the jnp implementation
remains the reference (and the CPU path); tests/test_pallas_clip.py asserts
elementwise agreement in interpret mode.

Reference for the physics: collisions.jl:30-119 (calc_normal_force's
two-intersection fast case); the kernel replaces GeometryOps'
GO.intersection for these contacts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .clip import SLIVER_TOL_F32, SLIVER_TOL_F64

V16 = 16
TB = 1024  # pairs per program (lane-major); VMEM use ~2 MB

# output rows in the packed [16, B] result
_ROWS = dict(
    cnt=0, contain=1, ok=2, area=3, cx=4, cy=5,
    ax=6, ay=7, bx=8, by=9, pnx=10, pny=11,
)


def _mod_pos(a, n):
    """Floored modulo for small-magnitude floats (exact in f32 here)."""
    return a - n * jnp.floor(a / n)


def _kernel(pax, pay, pbx, pby, pem, qax, qay, qbx, qby, qem,
            pn, qn, pert, out):
    dtype = pax.dtype
    eps = jnp.asarray(1e-12, dtype)
    one = jnp.asarray(1.0, dtype)

    # deterministic degeneracy-breaking offset on Q (two_cross_pass)
    offx = jnp.asarray(0.6180339887498949, dtype)
    p = pert[:]                      # [1, TB]
    qa_x = qax[:] + p * offx
    qa_y = qay[:] + p
    qb_x = qbx[:] + p * offx
    qb_y = qby[:] + p

    pa_x, pa_y, pb_x, pb_y = pax[:], pay[:], pbx[:], pby[:]
    pe_m = pem[:]                    # [16, TB] f32 0/1
    qe_m = qem[:]
    nP = pn[:]                       # [1, TB] f32
    nQ = qn[:]

    sx = qb_x - qa_x                 # [16, TB] Q edge vectors
    sy = qb_y - qa_y

    # Mosaic only supports integer iota; cast to the compute dtype
    iota_w = jax.lax.broadcasted_iota(
        jnp.int32, pe_m.shape, 0
    ).astype(dtype)  # [16, TB]

    z1 = jnp.zeros_like(nP)
    cnt = z1
    n_en = z1
    Xen_x = z1; Xen_y = z1; Xex_x = z1; Xex_y = z1
    e_en = z1; f_en = z1; e_ex = z1; f_ex = z1
    t_en = z1; u_en = z1; t_ex = z1; u_ex = z1

    def srow(x):                     # [16, TB] -> [1, TB]
        return jnp.sum(x, axis=0, keepdims=True)

    for v in range(V16):
        rx = pb_x[v:v + 1] - pa_x[v:v + 1]      # [1, TB]
        ry = pb_y[v:v + 1] - pa_y[v:v + 1]
        d0x = qa_x - pa_x[v:v + 1]              # [16, TB]
        d0y = qa_y - pa_y[v:v + 1]
        denom = rx * sy - ry * sx
        dsafe = jnp.where(denom == 0, one, denom)
        t = (d0x * sy - d0y * sx) / dsafe
        u = (d0x * ry - d0y * rx) / dsafe
        proper = (
            (denom != 0)
            & (t > eps) & (t < 1 - eps)
            & (u > eps) & (u < 1 - eps)
            & (pe_m[v:v + 1] > 0) & (qe_m > 0)
        )
        cxp = pa_x[v:v + 1] + t * rx
        cyp = pa_y[v:v + 1] + t * ry
        enter = proper & (denom < 0)
        exit_ = proper & (denom >= 0)
        ef = enter.astype(dtype)
        xf = exit_.astype(dtype)
        cnt = cnt + srow(proper.astype(dtype))
        n_en = n_en + srow(ef)
        Xen_x = Xen_x + srow(ef * cxp)
        Xen_y = Xen_y + srow(ef * cyp)
        Xex_x = Xex_x + srow(xf * cxp)
        Xex_y = Xex_y + srow(xf * cyp)
        e_en = e_en + srow(ef) * v
        e_ex = e_ex + srow(xf) * v
        f_en = f_en + srow(ef * iota_w)
        f_ex = f_ex + srow(xf * iota_w)
        t_en = t_en + srow(ef * t)
        u_en = u_en + srow(ef * u)
        t_ex = t_ex + srow(xf * t)
        u_ex = u_ex + srow(xf * u)

    ok = (cnt == 2) & (n_en == 1)

    # ---- chain integrals (two_cross_pass._chain_pm, elementwise) ----------
    iota_v = iota_w  # same shape/meaning per ring

    def chain(ax_, ay_, bx_, by_, em_, n_, e_in, t_in, Xin_x, Xin_y,
              e_out, t_out, Xout_x, Xout_y):
        nsafe = jnp.maximum(n_, one)
        same = (e_in == e_out) & (t_out > t_in)
        sel_in = (iota_v == e_in).astype(dtype)
        sel_out = (iota_v == e_out).astype(dtype)
        b_in_x = srow(sel_in * bx_)
        b_in_y = srow(sel_in * by_)
        a_out_x = srow(sel_out * ax_)
        a_out_y = srow(sel_out * ay_)
        cnt_full = _mod_pos(e_out - e_in - 1, nsafe)
        e0 = _mod_pos(e_in + 1, nsafe)
        inrun = (
            (_mod_pos(iota_v - e0, nsafe) < cnt_full) & (iota_v < n_)
        ).astype(dtype)
        cr = ax_ * by_ - bx_ * ay_
        S_run = 0.5 * srow(inrun * cr)
        MX_run = srow(inrun * (ax_ + bx_) * cr)
        MY_run = srow(inrun * (ay_ + by_) * cr)

        def seg(x1, y1, x2, y2):
            c = x1 * y2 - x2 * y1
            return 0.5 * c, (x1 + x2) * c, (y1 + y2) * c

        S1, MX1, MY1 = seg(Xin_x, Xin_y, Xout_x, Xout_y)
        Sp1, MXp1, MYp1 = seg(Xin_x, Xin_y, b_in_x, b_in_y)
        Sp2, MXp2, MYp2 = seg(a_out_x, a_out_y, Xout_x, Xout_y)
        S = jnp.where(same, S1, Sp1 + S_run + Sp2)
        MX = jnp.where(same, MX1, MXp1 + MX_run + MXp2)
        MY = jnp.where(same, MY1, MYp1 + MY_run + MYp2)
        return S, MX, MY

    S_P, MX_P, MY_P = chain(
        pa_x, pa_y, pb_x, pb_y, pe_m, nP,
        e_en, t_en, Xen_x, Xen_y, e_ex, t_ex, Xex_x, Xex_y,
    )
    S_Q, MX_Q, MY_Q = chain(
        qa_x, qa_y, qb_x, qb_y, qe_m, nQ,
        f_ex, u_ex, Xex_x, Xex_y, f_en, u_en, Xen_x, Xen_y,
    )
    S = S_P + S_Q

    crP = pa_x * pb_y - pb_x * pa_y
    areaP = jnp.abs(0.5 * srow(pe_m * crP))
    crQ = qa_x * qb_y - qb_x * qa_y
    areaQ = jnp.abs(0.5 * srow(qe_m * crQ))
    max_reasonable = jnp.minimum(areaP, areaQ) * (1 + 1e-6)
    # sliver tolerance: shared with two_cross_pass (clip.SLIVER_TOL_*) -
    # tiny-negative S from roundoff on edge-aligned contacts counts as a
    # zero-area fast contact, not a slow-path bounce
    sliver = SLIVER_TOL_F64 if dtype == jnp.float64 else SLIVER_TOL_F32
    ok = ok & (S > -sliver * max_reasonable) & (S <= max_reasonable)
    pos = ok & (S > 0)
    posf = pos.astype(dtype)
    area = posf * S
    denom_c = jnp.where(pos, 6.0 * S, one)
    cx = posf * (MX_P + MX_Q) / denom_c
    cy = posf * (MY_P + MY_Q) / denom_c

    # ---- containment (point-in-polygon, crossing number) -------------------
    def pip(px, py, ax_, ay_, bx_, by_, em_):
        cond = (ay_ > py) != (by_ > py)
        dy = by_ - ay_
        tt = (py - ay_) / jnp.where(dy == 0, one, dy)
        xint = ax_ + tt * (bx_ - ax_)
        hits = srow((cond & (em_ > 0) & (px < xint)).astype(dtype))
        return _mod_pos(hits, 2.0) == 1.0

    p_in_q = pip(pa_x[0:1], pa_y[0:1], qa_x, qa_y, qb_x, qb_y, qe_m)
    q_in_p = pip(qa_x[0:1], qa_y[0:1], pa_x, pa_y, pb_x, pb_y, pe_m)
    contain = jnp.where(
        cnt == 0,
        jnp.where(p_in_q, areaP, jnp.where(q_in_p, areaQ, 0.0)),
        0.0,
    )

    pnx = -(Xex_y - Xen_y)
    pny = Xex_x - Xen_x

    rows = [
        cnt, contain, ok.astype(dtype), area, cx, cy,
        Xen_x, Xen_y, Xex_x, Xex_y, pnx, pny,
        z1, z1, z1, z1,
    ]
    out[:] = jnp.concatenate(rows, axis=0)


@partial(jax.jit, static_argnames=("interpret",))
def two_cross_pallas_raw(pv, pn, qv, qn, perturb, interpret: bool = False):
    """Pallas-fused two_cross_pass for V = W = 16 rings, f32.

    pv [B, 16, 2], pn [B] int, qv [B, 16, 2] (already shifted), qn [B],
    perturb [B].  Returns the packed [16, B] result (rows per _ROWS).
    """
    B = pv.shape[0]
    dtype = pv.dtype
    if pv.shape[1] < V16:  # pad ring slots to 16 (repeat-last padding)
        pv = jnp.concatenate(
            [pv] + [pv[:, -1:]] * (V16 - pv.shape[1]), axis=1
        )
    if qv.shape[1] < V16:
        qv = jnp.concatenate(
            [qv] + [qv[:, -1:]] * (V16 - qv.shape[1]), axis=1
        )
    Bp = ((B + TB - 1) // TB) * TB

    def ring_planes(v, n):
        ax = jnp.moveaxis(v[..., 0], -1, 0)      # [16, B]
        ay = jnp.moveaxis(v[..., 1], -1, 0)
        idx = jnp.arange(V16)[:, None]
        em = (idx < n[None, :]).astype(dtype)
        bx = jnp.roll(ax, -1, axis=0)
        by = jnp.roll(ay, -1, axis=0)
        wrap = idx == (n[None, :] - 1)
        bx = jnp.where(wrap, ax[0][None, :], bx)
        by = jnp.where(wrap, ay[0][None, :], by)
        return ax, ay, bx, by, em

    pax, pay, pbx, pby, pem = ring_planes(pv, pn)
    qax, qay, qbx, qby, qem = ring_planes(qv, qn)

    def padp(x):
        return jnp.pad(x, ((0, 0), (0, Bp - B)))

    planes = [padp(x) for x in
              (pax, pay, pbx, pby, pem, qax, qay, qbx, qby, qem)]
    scalars = [
        padp(pn.astype(dtype)[None, :]),
        padp(qn.astype(dtype)[None, :]),
        padp(perturb.astype(dtype)[None, :]),
    ]

    grid = (Bp // TB,)
    plane_spec = pl.BlockSpec((V16, TB), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((1, TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[plane_spec] * 10 + [scalar_spec] * 3,
        out_specs=pl.BlockSpec((V16, TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V16, Bp), dtype),
        interpret=interpret,
    )(*planes, *scalars)
    return out[:, :B]


def two_cross_pallas(pv, pn, qv, qn, perturb, interpret: bool = False):
    """TwoCrossResult-compatible wrapper around the packed kernel output."""
    from .clip import TwoCrossResult

    r = two_cross_pallas_raw(pv, pn, qv, qn, perturb, interpret=interpret)
    g = lambda k: r[_ROWS[k]]
    return TwoCrossResult(
        cnt=g("cnt").astype(jnp.int32),
        contain=g("contain"),
        ok=g("ok") > 0,
        area=g("area"),
        centroid=jnp.stack([g("cx"), g("cy")], axis=-1),
        chord_a=jnp.stack([g("ax"), g("ay")], axis=-1),
        chord_b=jnp.stack([g("bx"), g("by")], axis=-1),
        p_norm=jnp.stack([g("pnx"), g("pny")], axis=-1),
    )
