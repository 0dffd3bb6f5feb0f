"""Fixed-shape batched polygon-polygon intersection for TPU.

This module is the TPU-native replacement for the reference's geometry kernel
(GeometryOps.jl ``GO.intersection`` / ``GO.intersection_points`` used by
``/root/reference/src/physical_processes/collisions.jl``).  Instead of
materializing intersection polygons (dynamic shapes), we compute, for each
pair of padded CCW rings, the *aggregate quantities the physics actually
needs*, with fully static shapes:

  * total intersection area (for fuse / remove-overlap checks),
  * per overlap region: area, centroid, number of boundary crossings,
    the two crossing points (2-crossing case), and the inward-normal sum /
    length / segment-count of the part of the region boundary lying on the
    subject polygon P ("P-chain") - which is exactly what the Hopkins
    contact-force model needs (see collisions.py).

Algorithm (a data-parallel Weiler-Atherton):

  1. All O(V^2) edge-pair proper crossings are computed in one vectorized
     sweep.  Each crossing stores its point, its position (edge index +
     parameter) along both rings, and whether the intersection boundary
     leaves it along P or along Q (sign of the edge cross product).
  2. Crossings are sorted along each ring to build "next crossing along P"
     and "next crossing along Q" pointers.
  3. Each crossing has exactly one outgoing boundary arc (along P if P
     enters Q there, else along Q).  The resulting successor function is a
     permutation whose cycles are precisely the overlap regions.
  4. Per-arc line integrals (shoelace area, centroid moments, length,
     normal sums) are computed with prefix sums over the ring edges, and
     accumulated per cycle with pointer-doubling + segment sums.

Everything is O(V^2 + CAP^2) per pair with static shapes, so the whole thing
vmaps over thousands of candidate pairs and compiles to one XLA program.

Degeneracies (vertex exactly on an edge, collinear overlapping edges) are
broken by an optional deterministic perturbation of Q.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .polygon import close_ring, point_in_polygon, signed_area

__all__ = ["ClipRegions", "intersect_regions", "intersect_area"]

# Maximum number of boundary crossings tracked per pair. 16 supports up to 8
# distinct overlap regions, far beyond what floe contacts produce in practice
# (the reference's C-shape golden test has 4 crossings / 2 regions).
DEFAULT_CAP = 16

# Sliver tolerance for the two-crossing fast path, shared with the Pallas
# kernel (pallas_clip.py) so the two implementations cannot drift: a contact
# whose chained shoelace sum S lands slightly NEGATIVE from roundoff (worst
# observed ~2.4e-4 relative in f32 on shear-packed edge-aligned contacts) is
# accepted as a zero-area fast-path contact instead of bouncing to the slow
# kernel.  1e-3 = a few x the observed bound; anything more negative is a
# genuine inconsistency and takes the slow path.
SLIVER_TOL_F32 = 1e-3
SLIVER_TOL_F64 = 1e-10


class ClipRegions(NamedTuple):
    """Result of intersect_regions for one pair (or batched leading dims).

    All region arrays have a trailing region-capacity axis of size CAP; only
    slots where ``valid`` is True contain real regions.
    """

    total_area: jnp.ndarray  # [] total intersection area
    area: jnp.ndarray        # [CAP] per-region area
    centroid: jnp.ndarray    # [CAP, 2] per-region centroid
    n_cross: jnp.ndarray     # [CAP] number of boundary crossings in region
    chord_a: jnp.ndarray     # [CAP, 2] first crossing point of region
    chord_b: jnp.ndarray     # [CAP, 2] second crossing point (m==2 chord)
    p_norm: jnp.ndarray      # [CAP, 2] inward-normal sum over P-chain
    p_len: jnp.ndarray       # [CAP] total length of P-chain segments
    p_cnt: jnp.ndarray       # [CAP] number of P-chain segments
    q_cnt: jnp.ndarray       # [CAP] number of Q-chain segments
    valid: jnp.ndarray       # [CAP] bool region validity
    overflow: jnp.ndarray    # [] bool - more crossings than CAP (unreliable)


def _ring_prefix(v, n, V):
    """Per-edge integral quantities + doubled prefix sums for run queries.

    Returns dict with per-edge arrays [V] (a, b endpoints implied by
    close_ring) and prefix arrays [2V+1] such that the sum of quantity q over
    ``cnt`` full edges starting at edge ``e0`` (cyclic, cnt <= n) is
    ``P[e0+cnt] - P[e0]``.
    """
    a, b = close_ring(v, n)
    cr = a[:, 0] * b[:, 1] - b[:, 0] * a[:, 1]
    eidx = jnp.arange(V)
    em = eidx < n
    q_S = jnp.where(em, 0.5 * cr, 0.0)
    q_MX = jnp.where(em, (a[:, 0] + b[:, 0]) * cr, 0.0)
    q_MY = jnp.where(em, (a[:, 1] + b[:, 1]) * cr, 0.0)
    q_LEN = jnp.where(em, jnp.linalg.norm(b - a, axis=-1), 0.0)

    idx2 = jnp.arange(2 * V)
    nsafe = jnp.maximum(n, 1)
    src = idx2 % nsafe
    valid2 = idx2 < 2 * n

    def doubled_prefix(q):
        q2 = jnp.where(valid2, q[src], 0.0)
        return jnp.concatenate([jnp.zeros((1,), q.dtype), jnp.cumsum(q2)])

    return {
        "a": a,
        "b": b,
        "P_S": doubled_prefix(q_S),
        "P_MX": doubled_prefix(q_MX),
        "P_MY": doubled_prefix(q_MY),
        "P_LEN": doubled_prefix(q_LEN),
    }


def _seg_quantities(p1, p2):
    """Integral quantities of one directed segment p1->p2."""
    cr = p1[..., 0] * p2[..., 1] - p2[..., 0] * p1[..., 1]
    S = 0.5 * cr
    MX = (p1[..., 0] + p2[..., 0]) * cr
    MY = (p1[..., 1] + p2[..., 1]) * cr
    LEN = jnp.linalg.norm(p2 - p1, axis=-1)
    return S, MX, MY, LEN


def _arc_quantities(ring, n, Xk, ek, Xk2, ek2, fwd_same_edge):
    """Line integrals over the ring arc from crossing point Xk (on edge ek)
    forward to crossing point Xk2 (on edge ek2).

    fwd_same_edge: whether both points are on the same edge with Xk2 ahead of
    Xk (single-segment arc).
    Returns (S, MX, MY, LEN, CNT).
    """
    nsafe = jnp.maximum(n, 1)
    # single-segment case
    S1, MX1, MY1, LEN1 = _seg_quantities(Xk, Xk2)

    # multi-segment case
    b_ek = ring["b"][ek]        # endpoint of edge ek
    a_ek2 = ring["a"][ek2]      # start vertex of edge ek2
    cnt_full = (ek2 - ek - 1) % nsafe
    e0 = (ek + 1) % nsafe

    def run(P):
        return P[e0 + cnt_full] - P[e0]

    Sp1, MXp1, MYp1, LENp1 = _seg_quantities(Xk, b_ek)
    Sp2, MXp2, MYp2, LENp2 = _seg_quantities(a_ek2, Xk2)
    S2 = Sp1 + run(ring["P_S"]) + Sp2
    MX2 = MXp1 + run(ring["P_MX"]) + MXp2
    MY2 = MYp1 + run(ring["P_MY"]) + MYp2
    LEN2 = LENp1 + run(ring["P_LEN"]) + LENp2
    CNT2 = 2 + cnt_full

    S = jnp.where(fwd_same_edge, S1, S2)
    MX = jnp.where(fwd_same_edge, MX1, MX2)
    MY = jnp.where(fwd_same_edge, MY1, MY2)
    LEN = jnp.where(fwd_same_edge, LEN1, LEN2)
    CNT = jnp.where(fwd_same_edge, 1, CNT2)
    return S, MX, MY, LEN, CNT


def _next_pointers(key, valid, CAP):
    """Given sort keys along one ring, build next-crossing pointers.

    Returns nxt [CAP] with nxt[k] = index of the crossing that follows k when
    walking the ring forward (cyclic among valid crossings); invalid -> k.
    """
    big = jnp.inf
    keys = jnp.where(valid, key, big)
    order = jnp.argsort(keys)  # valid first, ring order
    C = jnp.sum(valid.astype(jnp.int32))
    Csafe = jnp.maximum(C, 1)
    pos = jnp.zeros((CAP,), jnp.int32).at[order].set(jnp.arange(CAP, dtype=jnp.int32))
    nxt = order[(pos + 1) % Csafe]
    return jnp.where(valid, nxt, jnp.arange(CAP))


@partial(jax.jit, static_argnames=("CAP",))
def intersect_regions(pv, pn, qv, qn, CAP: int = DEFAULT_CAP, perturb=0.0) -> ClipRegions:
    """Intersection regions of two padded CCW rings (single pair).

    vmap over leading axes for batching. See module docstring.

    ``perturb``: magnitude of a deterministic offset applied to Q to break
    degeneracies (shared vertices, collinear overlapping edges). Pass a value
    tiny relative to the geometry scale (e.g. 1e-7 * floe radius).
    """
    V = pv.shape[-2]
    W = qv.shape[-2]
    dtype = pv.dtype
    qv = qv + perturb * jnp.asarray([0.6180339887498949, 1.0], dtype)

    pa, pb = close_ring(pv, pn)
    qa, qb = close_ring(qv, qn)
    pe_m = jnp.arange(V) < pn
    qe_m = jnp.arange(W) < qn

    # ---- 1. all proper edge-pair crossings --------------------------------
    r = (pb - pa)[:, None, :]        # [V,1,2] P edge vectors
    s = (qb - qa)[None, :, :]        # [1,W,2] Q edge vectors
    d0 = qa[None, :, :] - pa[:, None, :]  # [V,W,2]
    denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]
    denom_safe = jnp.where(denom == 0, 1.0, denom)
    t = (d0[..., 0] * s[..., 1] - d0[..., 1] * s[..., 0]) / denom_safe
    u = (d0[..., 0] * r[..., 1] - d0[..., 1] * r[..., 0]) / denom_safe
    eps = jnp.asarray(1e-12, dtype)
    proper = (
        (denom != 0)
        & (t > eps) & (t < 1 - eps)
        & (u > eps) & (u < 1 - eps)
        & pe_m[:, None] & qe_m[None, :]
    )
    px = pa[:, None, 0] + t * r[..., 0]
    py = pa[:, None, 1] + t * r[..., 1]
    # boundary leaves this crossing along P iff P's edge enters Q's interior:
    # cross(r, s) < 0  (both rings CCW)
    followP_all = denom < 0

    # ---- 2. compact to CAP ------------------------------------------------
    flat = proper.reshape(-1)
    n_cross_total = jnp.sum(flat.astype(jnp.int32))
    # unreliable if crossings overflow capacity or parity is violated
    # (odd crossing count signals an unresolved degeneracy)
    overflow = (n_cross_total > CAP) | (n_cross_total % 2 == 1)
    (sel,) = jnp.nonzero(flat, size=CAP, fill_value=V * W)
    # append a dummy invalid row for the fill index
    def takef(x, fill=0.0):
        xf = jnp.concatenate([x.reshape(-1), jnp.asarray([fill], x.dtype)])
        return xf[sel]

    valid = sel < V * W
    Xp = jnp.stack([takef(px), takef(py)], axis=-1)     # [CAP,2]
    ek = takef(jnp.broadcast_to(jnp.arange(V)[:, None], (V, W)).astype(jnp.int32), 0)
    fj = takef(jnp.broadcast_to(jnp.arange(W)[None, :], (V, W)).astype(jnp.int32), 0)
    tk = takef(t)
    uk = takef(u)
    followP = takef(followP_all, False).astype(bool) & valid

    # ---- 3. next pointers along each ring ---------------------------------
    nxtP = _next_pointers(ek.astype(dtype) + tk, valid, CAP)
    nxtQ = _next_pointers(fj.astype(dtype) + uk, valid, CAP)

    # ---- 4. per-crossing outgoing arc integrals ---------------------------
    ringP = _ring_prefix(pv, pn, V)
    ringQ = _ring_prefix(qv, qn, W)

    # along-P arc k -> nxtP[k]
    k2 = nxtP
    same_fwd_P = (ek[k2] == ek) & (tk[k2] > tk)
    SP, MXP, MYP, LENP, CNTP = _arc_quantities(
        ringP, pn, Xp, ek, Xp[k2], ek[k2], same_fwd_P
    )
    # along-Q arc k -> nxtQ[k]
    k3 = nxtQ
    same_fwd_Q = (fj[k3] == fj) & (uk[k3] > uk)
    SQ, MXQ, MYQ, LENQ, CNTQ = _arc_quantities(
        ringQ, qn, Xp, fj, Xp[k3], fj[k3], same_fwd_Q
    )

    succ = jnp.where(followP, nxtP, nxtQ)
    succ = jnp.where(valid, succ, jnp.arange(CAP))
    arcS = jnp.where(valid, jnp.where(followP, SP, SQ), 0.0)
    arcMX = jnp.where(valid, jnp.where(followP, MXP, MXQ), 0.0)
    arcMY = jnp.where(valid, jnp.where(followP, MYP, MYQ), 0.0)
    # P-chain only quantities
    endpt = jnp.where(followP[:, None], Xp[k2], Xp)
    darc = endpt - Xp  # displacement of P-arcs (zero for Q-arcs)
    arcNx = jnp.where(valid & followP, -darc[:, 1], 0.0)
    arcNy = jnp.where(valid & followP, darc[:, 0], 0.0)
    arcPL = jnp.where(valid & followP, LENP, 0.0)
    arcPC = jnp.where(valid & followP, CNTP, 0)
    arcQC = jnp.where(valid & ~followP, CNTQ, 0)

    # ---- 5. cycle identification (pointer doubling, min-index labels) -----
    lbl = jnp.arange(CAP)
    s2 = succ
    rounds = max(1, (CAP - 1).bit_length())
    for _ in range(rounds):
        lbl = jnp.minimum(lbl, lbl[s2])
        s2 = s2[s2]
    rep = lbl  # [CAP] min crossing index in each cycle

    seg = jnp.where(valid, rep, CAP)  # invalid -> dumped in extra bucket
    num_segments = CAP + 1

    def ssum(x, dt=None):
        return jax.ops.segment_sum(x, seg, num_segments=num_segments)[:CAP]

    reg_S = ssum(arcS)
    reg_MX = ssum(arcMX)
    reg_MY = ssum(arcMY)
    reg_Nx = ssum(arcNx)
    reg_Ny = ssum(arcNy)
    reg_PL = ssum(arcPL)
    reg_PC = ssum(arcPC.astype(jnp.int32))
    reg_QC = ssum(arcQC.astype(jnp.int32))
    reg_m = ssum(valid.astype(jnp.int32))

    # sanity: a real overlap region can never exceed either input's area;
    # degenerate tracing (unbroken shared-edge configurations) can produce
    # phantom cycles, which this clamp discards
    areaP_s = jnp.abs(signed_area(pv, pn))
    areaQ_s = jnp.abs(signed_area(qv, qn))
    max_reasonable = jnp.minimum(areaP_s, areaQ_s) * (1 + 1e-6)
    reg_valid = (reg_m >= 2) & (reg_S > 0) & (reg_S <= max_reasonable)
    reg_area = jnp.where(reg_valid, reg_S, 0.0)
    denom_c = jnp.where(reg_valid, 6.0 * reg_S, 1.0)
    reg_cx = jnp.where(reg_valid, reg_MX / denom_c, 0.0)
    reg_cy = jnp.where(reg_valid, reg_MY / denom_c, 0.0)

    # chord endpoints: region representative crossing and its successor
    idx = jnp.arange(CAP)
    chord_a = Xp[idx]
    chord_b = Xp[succ[idx]]

    total_cross_area = jnp.sum(reg_area)

    # ---- 6. containment fallback (no crossings) ---------------------------
    no_cross = n_cross_total == 0
    p0 = pv[0]
    q0 = qv[0]
    p_in_q = point_in_polygon(p0, qv, qn)
    q_in_p = point_in_polygon(q0, pv, pn)
    areaP = jnp.abs(signed_area(pv, pn))
    areaQ = jnp.abs(signed_area(qv, qn))
    contain_area = jnp.where(p_in_q, areaP, jnp.where(q_in_p, areaQ, 0.0))
    total_area = jnp.where(no_cross, contain_area, total_cross_area)

    return ClipRegions(
        total_area=total_area,
        area=reg_area,
        centroid=jnp.stack([reg_cx, reg_cy], axis=-1),
        n_cross=reg_m,
        chord_a=chord_a,
        chord_b=chord_b,
        p_norm=jnp.stack([reg_Nx, reg_Ny], axis=-1),
        p_len=reg_PL,
        p_cnt=reg_PC,
        q_cnt=reg_QC,
        valid=reg_valid,
        overflow=overflow,
    )


def intersect_area(pv, pn, qv, qn, CAP: int = DEFAULT_CAP):
    """Total intersection area only (single pair; vmap for batches)."""
    return intersect_regions(pv, pn, qv, qn, CAP=CAP).total_area


class TwoCrossResult(NamedTuple):
    """Fused stage-1 + single-region narrow phase over a pair batch.

    All arrays have leading batch shape [B].  ``cnt``/``contain`` replace
    count_crossings; when ``ok`` is True the pair has exactly two proper
    boundary crossings forming one overlap region whose quantities are given
    directly (area/centroid/chord/p_norm, matching what intersect_regions
    would return in its single-region slot). Pairs with ``cnt > 2`` (or a
    parity violation) must go through the general intersect_regions kernel.
    """

    cnt: jnp.ndarray        # [B] number of proper boundary crossings
    contain: jnp.ndarray    # [B] containment area for cnt == 0 pairs
    ok: jnp.ndarray         # [B] cnt==2 with clean enter/exit parity
    area: jnp.ndarray       # [B] region area (valid where ok)
    centroid: jnp.ndarray   # [B, 2]
    chord_a: jnp.ndarray    # [B, 2] entering crossing point
    chord_b: jnp.ndarray    # [B, 2] exiting crossing point
    p_norm: jnp.ndarray     # [B, 2] inward-normal sum over the P-chain


def _ring_pm(v, n):
    """Pair-minor ring edges: v [B, V, 2], n [B] ->
    (ax, ay, bx, by, em) each [V, B]; em masks valid edges."""
    V = v.shape[-2]
    ax = jnp.moveaxis(v[..., 0], -1, 0)  # [V, B]
    ay = jnp.moveaxis(v[..., 1], -1, 0)
    idx = jnp.arange(V)[:, None]
    em = idx < n[None, :]
    # b[i] = v[i+1], with the ring closed at i == n-1 -> v[0]
    bx = jnp.roll(ax, -1, axis=0)
    by = jnp.roll(ay, -1, axis=0)
    wrap = idx == (n[None, :] - 1)
    bx = jnp.where(wrap, ax[0][None, :], bx)
    by = jnp.where(wrap, ay[0][None, :], by)
    return ax, ay, bx, by, em


def _pip_pm(px, py, ax, ay, bx, by, em):
    """Pair-minor point-in-polygon (crossing number): px, py [B]; ring
    arrays [W, B] -> bool [B]."""
    cond = (ay > py[None, :]) != (by > py[None, :])
    dy = by - ay
    tt = (py[None, :] - ay) / jnp.where(dy == 0, 1.0, dy)
    xint = ax + tt * (bx - ax)
    hits = jnp.sum((cond & em & (px[None, :] < xint)).astype(jnp.int32), axis=0)
    return (hits % 2) == 1


def _seg_pm(x1, y1, x2, y2):
    """Shoelace/centroid integrals of one directed segment, batched [B]."""
    cr = x1 * y2 - x2 * y1
    return 0.5 * cr, (x1 + x2) * cr, (y1 + y2) * cr


def _chain_pm(axv, ayv, bxv, byv, n, e_in, t_in, Xin_x, Xin_y,
              e_out, t_out, Xout_x, Xout_y):
    """Line integrals along the ring arc from crossing ``Xin`` (on edge
    ``e_in`` at parameter ``t_in``) forward to ``Xout`` (edge ``e_out``).

    Ring arrays [V, B]; everything else [B].  Pure elementwise masked sums -
    the cyclic run of full edges strictly between the crossings is selected
    with modular index arithmetic instead of prefix sums + gathers.
    """
    V = axv.shape[0]
    nsafe = jnp.maximum(n, 1)[None, :]
    idx = jnp.arange(V)[:, None]
    same = (e_in == e_out) & (t_out > t_in)

    # vertex lookups as masked sums (no gathers)
    sel_in = idx == e_in[None, :]
    sel_out = idx == e_out[None, :]
    b_in_x = jnp.sum(jnp.where(sel_in, bxv, 0.0), axis=0)
    b_in_y = jnp.sum(jnp.where(sel_in, byv, 0.0), axis=0)
    a_out_x = jnp.sum(jnp.where(sel_out, axv, 0.0), axis=0)
    a_out_y = jnp.sum(jnp.where(sel_out, ayv, 0.0), axis=0)

    # full edges strictly between e_in and e_out (cyclic, open interval)
    cnt_full = jnp.mod(e_out - e_in - 1, nsafe[0])  # [B]
    e0 = jnp.mod(e_in + 1, nsafe[0])
    inrun = (jnp.mod(idx - e0[None, :], nsafe) < cnt_full[None, :]) & (idx < n[None, :])
    cr = axv * byv - bxv * ayv
    S_run = 0.5 * jnp.sum(jnp.where(inrun, cr, 0.0), axis=0)
    MX_run = jnp.sum(jnp.where(inrun, (axv + bxv) * cr, 0.0), axis=0)
    MY_run = jnp.sum(jnp.where(inrun, (ayv + byv) * cr, 0.0), axis=0)

    S1, MX1, MY1 = _seg_pm(Xin_x, Xin_y, Xout_x, Xout_y)
    Sp1, MXp1, MYp1 = _seg_pm(Xin_x, Xin_y, b_in_x, b_in_y)
    Sp2, MXp2, MYp2 = _seg_pm(a_out_x, a_out_y, Xout_x, Xout_y)
    S = jnp.where(same, S1, Sp1 + S_run + Sp2)
    MX = jnp.where(same, MX1, MXp1 + MX_run + MXp2)
    MY = jnp.where(same, MY1, MYp1 + MY_run + MYp2)
    return S, MX, MY


def two_cross_pass(pv, pn, qv, qn, perturb) -> TwoCrossResult:
    """Fused crossing count + containment + single-region quantities for a
    batch of candidate pairs, laid out pair-minor for the TPU VPU (the pair
    axis rides the 128-lane dimension; V and W are leading axes).

    pv: [B, V, 2], pn: [B], qv: [B, W, 2] (already shifted), qn: [B],
    perturb: [B] degeneracy-breaking offset applied to Q.

    This is the collision narrow phase for the common case: exactly two
    proper boundary crossings => one overlap region bounded by the P-chain
    (enter -> exit along P) and the Q-chain (exit -> enter along Q), whose
    integrals reduce to masked elementwise sums.  Replaces the general
    sort/compact/cycle kernel (intersect_regions) for such pairs; pairs with
    more crossings are flagged for the general kernel.
    """
    dtype = pv.dtype
    off = jnp.asarray([0.6180339887498949, 1.0], dtype)
    qv = qv + perturb[:, None, None] * off

    pax, pay, pbx, pby, pe_m = _ring_pm(pv, pn)   # [V, B]
    qax, qay, qbx, qby, qe_m = _ring_pm(qv, qn)   # [W, B]

    # ---- all proper edge-pair crossings, [V, W, B] -------------------------
    rx = (pbx - pax)[:, None, :]
    ry = (pby - pay)[:, None, :]
    sx = (qbx - qax)[None, :, :]
    sy = (qby - qay)[None, :, :]
    d0x = qax[None, :, :] - pax[:, None, :]
    d0y = qay[None, :, :] - pay[:, None, :]
    denom = rx * sy - ry * sx
    denom_safe = jnp.where(denom == 0, 1.0, denom)
    t = (d0x * sy - d0y * sx) / denom_safe
    u = (d0x * ry - d0y * rx) / denom_safe
    eps = jnp.asarray(1e-12, dtype)
    proper = (
        (denom != 0)
        & (t > eps) & (t < 1 - eps)
        & (u > eps) & (u < 1 - eps)
        & pe_m[:, None, :] & qe_m[None, :, :]
    )
    cnt = jnp.sum(proper.astype(jnp.int32), axis=(0, 1))  # [B]

    # crossing point coordinates (only where proper)
    cxp = pax[:, None, :] + t * rx
    cyp = pay[:, None, :] + t * ry
    enter = proper & (denom < 0)   # boundary leaves along P (P enters Q)
    exit_ = proper & (denom >= 0)

    iV = jax.lax.broadcasted_iota(jnp.int32, (pv.shape[1], qv.shape[1], 1), 0)
    iW = jax.lax.broadcasted_iota(jnp.int32, (pv.shape[1], qv.shape[1], 1), 1)

    def pick(w, x):
        return jnp.sum(jnp.where(w, x, 0), axis=(0, 1))

    n_en = jnp.sum(enter.astype(jnp.int32), axis=(0, 1))
    ok = (cnt == 2) & (n_en == 1)

    Xen_x = pick(enter, cxp)
    Xen_y = pick(enter, cyp)
    Xex_x = pick(exit_, cxp)
    Xex_y = pick(exit_, cyp)
    e_en = pick(enter, iV)
    f_en = pick(enter, iW)
    e_ex = pick(exit_, iV)
    f_ex = pick(exit_, iW)
    t_en = pick(enter, t)
    u_en = pick(enter, u)
    t_ex = pick(exit_, t)
    u_ex = pick(exit_, u)

    # ---- region integrals: P-chain (enter->exit), Q-chain (exit->enter) ----
    S_P, MX_P, MY_P = _chain_pm(
        pax, pay, pbx, pby, pn, e_en, t_en, Xen_x, Xen_y,
        e_ex, t_ex, Xex_x, Xex_y,
    )
    S_Q, MX_Q, MY_Q = _chain_pm(
        qax, qay, qbx, qby, qn, f_ex, u_ex, Xex_x, Xex_y,
        f_en, u_en, Xen_x, Xen_y,
    )
    S = S_P + S_Q

    # areas of the inputs (for sanity clamp + containment)
    crP = pax * pby - pbx * pay
    areaP = jnp.abs(0.5 * jnp.sum(jnp.where(pe_m, crP, 0.0), axis=0))
    crQ = qax * qby - qbx * qay
    areaQ = jnp.abs(0.5 * jnp.sum(jnp.where(qe_m, crQ, 0.0), axis=0))
    max_reasonable = jnp.minimum(areaP, areaQ) * (1 + 1e-6)
    # sliver tolerance: shear-packed fields hold thousands of edge-aligned
    # contacts whose true overlap is ~0; roundoff then lands S slightly
    # NEGATIVE (observed <= 2.4e-4 relative in f32), which would bounce
    # every one of them to the general slow kernel each step.  They carry
    # ~zero force either way (force ~ area), so accept them as zero-area
    # fast-path contacts - the slow kernel would return the same ~0 at the
    # same precision.
    sliver = jnp.asarray(
        SLIVER_TOL_F64 if dtype == jnp.float64 else SLIVER_TOL_F32, dtype
    )
    ok = ok & (S > -sliver * max_reasonable) & (S <= max_reasonable)
    pos = ok & (S > 0)
    area = jnp.where(pos, S, 0.0)
    denom_c = jnp.where(pos, 6.0 * S, 1.0)
    cx = jnp.where(pos, (MX_P + MX_Q) / denom_c, 0.0)
    cy = jnp.where(pos, (MY_P + MY_Q) / denom_c, 0.0)

    # ---- containment fallback for cnt == 0 ---------------------------------
    p_in_q = _pip_pm(pax[0], pay[0], qax, qay, qbx, qby, qe_m)
    q_in_p = _pip_pm(qax[0], qay[0], pax, pay, pbx, pby, pe_m)
    contain = jnp.where(
        cnt == 0,
        jnp.where(p_in_q, areaP, jnp.where(q_in_p, areaQ, 0.0)),
        0.0,
    )

    # P-chain inward-normal sum telescopes to rot90(Xex - Xen)
    pnx = -(Xex_y - Xen_y)
    pny = Xex_x - Xen_x

    return TwoCrossResult(
        cnt=cnt,
        contain=contain,
        ok=ok,
        area=area,
        centroid=jnp.stack([cx, cy], axis=-1),
        chord_a=jnp.stack([Xen_x, Xen_y], axis=-1),
        chord_b=jnp.stack([Xex_x, Xex_y], axis=-1),
        p_norm=jnp.stack([pnx, pny], axis=-1),
    )


def _use_pallas_narrow() -> bool:
    """Route the 16-vertex narrow phase through the fused Pallas kernel on
    TPU (geometry/pallas_clip.py); SUBZERO_PALLAS=0 forces the jnp path."""
    import os

    if os.environ.get("SUBZERO_PALLAS", "1") == "0":
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def two_cross_dispatch(pv, pn, qv, qn, perturb) -> TwoCrossResult:
    """two_cross_pass with a pool-level small-ring fast path.

    Floes typically carry far fewer vertices than the padded capacity
    (Voronoi floes ~6-12; the smoothing cap is 30).  When every ring in the
    batch fits in 16 vertices, the O(V*W*B) crossing sweep runs on the
    first-16 slice - 4x less work at V=32 - and, on TPU, inside the fused
    Pallas kernel (VMEM-resident; the stock XLA lowering is HBM-bound).
    ``lax.cond`` keeps a single compiled program that adapts when
    fusing/welding grows rings past 16.
    """
    V = pv.shape[-2]
    W = qv.shape[-2]
    if _use_pallas_narrow() and pv.dtype == jnp.float32:
        from .pallas_clip import two_cross_pallas

        small_fn = two_cross_pallas
    else:
        small_fn = two_cross_pass
    if V <= 16 and W <= 16:
        return small_fn(pv, pn, qv, qn, perturb)
    small = (jnp.max(pn) <= 16) & (jnp.max(qn) <= 16)
    return jax.lax.cond(
        small,
        lambda: small_fn(pv[:, :16], pn, qv[:, :16], qn, perturb),
        lambda: two_cross_pass(pv, pn, qv, qn, perturb),
    )


def count_crossings(pv, pn, qv, qn, perturb=0.0):
    """Cheap stage-1 narrow-phase filter: number of proper boundary
    crossings between two padded rings, plus the containment intersection
    area for the zero-crossing case.

    Returns (count, containment_area).  Pairs with count == 0 and
    containment_area == 0 are disjoint; pairs with count > 0 need the full
    region machinery (intersect_regions).  Elementwise only - no sorts,
    gathers, or scans - so it runs fast over large candidate batches.
    """
    dtype = pv.dtype
    qv = qv + perturb * jnp.asarray([0.6180339887498949, 1.0], dtype)
    V = pv.shape[-2]
    W = qv.shape[-2]
    pa, pb = close_ring(pv, pn)
    qa, qb = close_ring(qv, qn)
    pe_m = jnp.arange(V) < pn
    qe_m = jnp.arange(W) < qn
    r = (pb - pa)[:, None, :]
    s = (qb - qa)[None, :, :]
    d0 = qa[None, :, :] - pa[:, None, :]
    denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]
    denom_safe = jnp.where(denom == 0, 1.0, denom)
    t = (d0[..., 0] * s[..., 1] - d0[..., 1] * s[..., 0]) / denom_safe
    u = (d0[..., 0] * r[..., 1] - d0[..., 1] * r[..., 0]) / denom_safe
    eps = jnp.asarray(1e-12, dtype)
    proper = (
        (denom != 0)
        & (t > eps) & (t < 1 - eps)
        & (u > eps) & (u < 1 - eps)
        & pe_m[:, None] & qe_m[None, :]
    )
    count = jnp.sum(proper.astype(jnp.int32))
    p_in_q = point_in_polygon(pv[0], qv, qn)
    q_in_p = point_in_polygon(qv[0], pv, pn)
    areaP = jnp.abs(signed_area(pv, pn))
    areaQ = jnp.abs(signed_area(qv, qn))
    contain = jnp.where(
        count > 0, 0.0, jnp.where(p_in_q, areaP, jnp.where(q_in_p, areaQ, 0.0))
    )
    return count, contain
