"""Floe time integration, stress and strain.

Vectorized port of the reference integrator
(/root/reference/src/physical_processes/update_floe.jl:469-551): a
semi-implicit 2nd-order (Adams-Bashforth-style) update with the reference's
exact warn-and-clamp semantics (force factor-of-10 reduction loop, velocity
caps at h/(2 dt), maximum-xi clamp), which materially affect trajectories.

The per-floe Threads.@threads loop becomes a plain batched computation over
the floe pool; warnings become counters the driver can report.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.domain import Domain, BoundaryKind, NORTH, SOUTH, EAST, WEST
from ..core.floes import FloeState
from ..geometry.polygon import rotate_about
from ..settings import DecayAreaScaledCalculator, FloeSettings


def update_stress_accum(floes: FloeState, stress_instant, floe_settings: FloeSettings):
    """calc_stress! (update_floe.jl:392-414): EMA accumulation via the
    configured stress calculator (stress_calculators.jl:118-122)."""
    calc = floe_settings.stress_calculator
    if isinstance(calc, DecayAreaScaledCalculator):
        lam = calc.lam
        accum = (1.0 - lam) * floes.stress_accum + lam * stress_instant
    else:
        raise NotImplementedError(type(calc))
    return floes._replace(stress_accum=accum, stress_instant=stress_instant)


def calc_strain(floes: FloeState):
    """calc_strain! (update_floe.jl:425-453), including the reference's
    faithful-port quirk of using ``u`` for the v-components (lines 441-442).

    strain = (1/2A) * sym(line integral of velocity differences)."""
    c = floes.centroid
    v = floes.verts - c[:, None, :]
    V = floes.max_verts
    idx = jnp.arange(V)
    last = jnp.maximum(floes.nverts - 1, 0)[:, None]
    nxt = jnp.where(idx[None, :] >= floes.nverts[:, None] - 1, 0, idx[None, :] + 1)
    nxt = jnp.minimum(nxt, last)
    p1 = v
    p2 = jnp.take_along_axis(v, nxt[..., None], axis=1)
    mask = idx[None, :] < floes.nverts[:, None]
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    xdiff, ydiff = x2 - x1, y2 - y1
    u = floes.u[:, None]
    xi = floes.xi[:, None]
    # point velocities (with the v := u quirk)
    u1 = u - xi * y1
    u2 = u - xi * y2
    v1 = u + xi * x1
    v2 = u + xi * x2
    udiff, vdiff = u2 - u1, v2 - v1
    m = lambda x: jnp.sum(jnp.where(mask, x, 0.0), axis=1)
    s11 = m(udiff * ydiff)
    s12 = 0.5 * m(udiff * xdiff + vdiff * ydiff)
    s22 = m(vdiff * xdiff)
    denom = 2.0 * jnp.where(floes.area > 0, floes.area, 1.0)
    strain = jnp.stack(
        [
            jnp.stack([s11, s12], axis=-1),
            jnp.stack([s12, s22], axis=-1),
        ],
        axis=-2,
    ) / denom[:, None, None]
    return floes._replace(strain=strain)


def timestep_floe_properties(
    floes: FloeState,
    dt: float,
    floe_settings: FloeSettings,
    stress_instant=None,
) -> FloeState:
    """The time integrator (update_floe.jl:469-551), batched."""
    act = floes.active
    if stress_instant is None:
        stress_instant = jnp.zeros_like(floes.stress_accum)
    floes = update_stress_accum(floes, stress_instant, floe_settings)

    # height cap (:482-485)
    height = jnp.minimum(floes.height, floe_settings.max_floe_height)

    # collision-force reduction loop (:487-491): F /= 10 until
    # max|F| <= mass/(5 dt); closed form of the while loop
    cforce = floes.collision_force
    ctrq = floes.collision_trq
    mass_safe = jnp.where(floes.mass > 0, floes.mass, 1.0)
    peak = jnp.max(jnp.abs(cforce), axis=-1)
    limit = mass_safe / (5.0 * dt)
    ratio = peak / limit
    k = jnp.where(
        ratio > 1.0,
        jnp.ceil(jnp.log10(jnp.maximum(ratio, 1.0 + 1e-300))),
        0.0,
    )
    # exact-boundary guard: after k-1 divisions the loop would stop if
    # peak/10^(k-1) == limit exactly (condition is strict >)
    k = jnp.where(ratio / (10.0 ** jnp.maximum(k - 1, 0.0)) <= 1.0, jnp.maximum(k - 1, 0.0), k)
    scale = 10.0 ** (-k)
    cforce = cforce * scale[:, None]
    ctrq = ctrq * scale

    # thermodynamic height change (:493-500)
    h_safe = jnp.where(height > 0, height, 1.0)
    dh = floes.hflx_factor / h_safe
    hfrac = (height + dh) / h_safe
    mass = floes.mass * jnp.where(act, hfrac, 1.0)
    moment = floes.moment * jnp.where(act, hfrac, 1.0)
    height = jnp.where(act, height - dh, height)
    h = height

    # move floes (:503-511)
    dx = 1.5 * dt * floes.u - 0.5 * dt * floes.p_dxdt
    dy = 1.5 * dt * floes.v - 0.5 * dt * floes.p_dydt
    dalpha = 1.5 * dt * floes.xi - 0.5 * dt * floes.p_dalphadt
    dx = jnp.where(act, dx, 0.0)
    dy = jnp.where(act, dy, 0.0)
    dalpha = jnp.where(act, dalpha, 0.0)
    alpha = floes.alpha + dalpha
    verts = rotate_about(floes.verts, floes.centroid, dalpha)
    shift = jnp.stack([dx, dy], axis=-1)
    verts = verts + shift[:, None, :]
    centroid = floes.centroid + shift
    p_dxdt = floes.u
    p_dydt = floes.v
    p_dalphadt = floes.xi

    # acceleration with velocity caps (:513-531)
    mass_safe = jnp.where(mass > 0, mass, 1.0)
    dudt = (floes.fx_oa + cforce[:, 0]) / mass_safe
    dvdt = (floes.fy_oa + cforce[:, 1]) / mass_safe
    cap = h / (2.0 * dt)
    exceed_u = jnp.abs(dt * dudt) > h / 2
    exceed_v = jnp.abs(dt * dvdt) > h / 2
    dudt_safe = jnp.where(dudt == 0, 1.0, dudt)
    dvdt_safe = jnp.where(dvdt == 0, 1.0, dvdt)
    frac1 = jnp.sign(dudt) * cap / dudt_safe
    frac2 = jnp.sign(dvdt) * cap / dvdt_safe
    frac = jnp.where(
        exceed_u & exceed_v,
        jnp.minimum(frac1, frac2),
        jnp.where(exceed_u, frac1, jnp.where(exceed_v, frac2, 1.0)),
    )
    dudt = frac * dudt
    dvdt = frac * dvdt
    u = floes.u + 1.5 * dt * dudt - 0.5 * dt * floes.p_dudt
    v = floes.v + 1.5 * dt * dvdt - 0.5 * dt * floes.p_dvdt

    # angular acceleration (:537-545)
    moment_safe = jnp.where(moment > 0, moment, 1.0)
    dxidt = (floes.trq_oa + ctrq) / moment_safe
    dxidt = frac * dxidt
    xi = floes.xi + 1.5 * dt * dxidt - 0.5 * dt * floes.p_dxidt
    xi = jnp.clip(xi, -floe_settings.maximum_xi, floe_settings.maximum_xi)

    def keep(new, old):
        return jnp.where(act if new.ndim == 1 else act.reshape((-1,) + (1,) * (new.ndim - 1)), new, old)

    floes = floes._replace(
        verts=keep(verts, floes.verts),
        centroid=keep(centroid, floes.centroid),
        height=keep(height, floes.height),
        mass=keep(mass, floes.mass),
        moment=keep(moment, floes.moment),
        alpha=keep(alpha, floes.alpha),
        u=keep(u, floes.u),
        v=keep(v, floes.v),
        xi=keep(xi, floes.xi),
        p_dxdt=keep(p_dxdt, floes.p_dxdt),
        p_dydt=keep(p_dydt, floes.p_dydt),
        p_dalphadt=keep(p_dalphadt, floes.p_dalphadt),
        p_dudt=keep(dudt, floes.p_dudt),
        p_dvdt=keep(dvdt, floes.p_dvdt),
        p_dxidt=keep(dxidt, floes.p_dxidt),
    )
    return calc_strain(floes)


def wrap_periodic(floes: FloeState, domain: Domain) -> FloeState:
    """Translate floes whose centroid left the domain through a periodic
    boundary back inside (the TPU-native replacement for the reference's
    parent/ghost swap, collisions.jl:925-1003)."""
    cx = floes.centroid[:, 0]
    cy = floes.centroid[:, 1]
    n, s = domain.vals[NORTH], domain.vals[SOUTH]
    e, w = domain.vals[EAST], domain.vals[WEST]
    shift_x = jnp.zeros_like(cx)
    shift_y = jnp.zeros_like(cy)
    if domain.ew_periodic:
        Lx = e - w
        shift_x = jnp.where(cx < w, Lx, jnp.where(cx > e, -Lx, 0.0))
    if domain.ns_periodic:
        Ly = n - s
        shift_y = jnp.where(cy < s, Ly, jnp.where(cy > n, -Ly, 0.0))
    shift = jnp.stack([shift_x, shift_y], axis=-1)
    shift = jnp.where(floes.active[:, None], shift, 0.0)
    return floes._replace(
        verts=floes.verts + shift[:, None, :],
        centroid=floes.centroid + shift,
    )
