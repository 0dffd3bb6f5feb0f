"""Ice <-> ocean/atmosphere coupling.

Vectorized port of /root/reference/src/physical_processes/coupling.jl:

  * one-way (ocean/atmos -> ice): sub-floe quadrature points are rotated to
    world frame, ocean/atmos fields are bilinearly interpolated at them
    (periodic seam wrapping replaces the reference's knot-window machinery,
    find_interp_knots, coupling.jl:660-797, with identical values), and
    quadratic drag + Coriolis + pressure-gradient stresses are averaged into
    per-floe forces/torques (calc_one_way_coupling!, coupling.jl:1486-1589).

  * two-way (ice/atmos -> ocean): per-point ocean stresses are segment-summed
    into (floe, line-centered-cell) buckets, floe areas inside covered cells
    are computed with the exact clip kernel, and per-cell ocean stress /
    sea-ice fraction / heatflux factor are assembled
    (calc_two_way_coupling!, coupling.jl:1617-1680).

The scatter structures CellFloes/CellStresses of the reference become dense
segment-sums - no per-cell lists.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import Constants
from ..core.domain import Domain, BoundaryKind, NORTH, SOUTH, EAST, WEST
from ..core.fields import AtmosState, OceanState
from ..core.floes import FloeState
from ..core.grid import RegRectilinearGrid
from ..geometry.clip import intersect_regions
from ..settings import CouplingSettings, FloeSettings


def _bilinear(field, gx, gy, grid: RegRectilinearGrid, ew_periodic, ns_periodic):
    """Bilinear interpolation of grid-point field(s) at world coords.

    ``field`` is [Nx+1, Ny+1] or [Nx+1, Ny+1, F] (F fields share the four
    gathers - much cheaper on TPU than F separate interpolations); periodic
    directions wrap (grid line 0 == grid line N)."""
    fx = (gx - grid.x0) / grid.dx
    fy = (gy - grid.y0) / grid.dy
    if ew_periodic:
        fx = jnp.mod(fx, grid.Nx)
    else:
        fx = jnp.clip(fx, 0.0, grid.Nx)
    if ns_periodic:
        fy = jnp.mod(fy, grid.Ny)
    else:
        fy = jnp.clip(fy, 0.0, grid.Ny)
    ix = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, grid.Nx - 1)
    iy = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, grid.Ny - 1)
    wx = fx - ix
    wy = fy - iy
    # flattened base index: four 1-D row gathers from [(Nx+1)*(Ny+1), F]
    # instead of 2-D advanced indexing - the 2-D gather lowering was 2.2x
    # slower on TPU (tools/probe_interp.py; 32.4 -> 14.4 ms at 1.4M points)
    GY = grid.Ny + 1
    flat = field.reshape((grid.Nx + 1) * GY, *field.shape[2:])
    k00 = ix * GY + iy
    f00 = flat[k00]
    f10 = flat[k00 + GY]
    f01 = flat[k00 + 1]
    f11 = flat[k00 + GY + 1]
    if field.ndim == 3:
        wx = wx[..., None]
        wy = wy[..., None]
    return (
        f00 * (1 - wx) * (1 - wy)
        + f10 * wx * (1 - wy)
        + f01 * (1 - wx) * wy
        + f11 * wx * wy
    )


def _windowed_interp(
    fields_fw, px, py, centroid, grid, ew_periodic, ns_periodic, W
):
    """Per-floe windowed bilinear interpolation (TPU fast path).

    ``fields_fw`` is [F, Nx+1, Ny+1] (field-major).  The generic
    ``_bilinear`` pays four random row-gathers per point - 8M serialized
    gathers at N=16k, P=128, 17 ms of the 54 ms coupling invocation, plus
    ~25 ms of [N, P, F]-minor layout padding in its consumers
    (tools/probe_coupling16k.py).  Every sub-floe point lies within rmax
    of its floe's centroid, so instead gather ONE [F, W, W] node window
    per floe (N dynamic-slice gathers from a halo-padded grid) and
    evaluate the bilinear as two W-contractions against one-hot weight
    stencils - MXU work with clean [.., P]-minor layouts throughout.

    Returns (vals [N, F, P], point_overflow [N, P]).  A point outside its
    floe's window (rmax grown past the window guarantee - same failure
    mode as the two-way cell window) reads clamped values and flags
    overflow; callers surface it like every other capacity flag.
    """
    F = fields_fw.shape[0]
    dtype = px.dtype
    GX, GY = grid.Nx + 1, grid.Ny + 1
    # halo-pad the node grid by W on every side: periodic wrap (node Nx is
    # node 0) or edge clamp (off-grid points are masked by in_bounds)
    xs = jnp.arange(-W, GX + W)
    ys = jnp.arange(-W, GY + W)
    xs = jnp.mod(xs, grid.Nx) if ew_periodic else jnp.clip(xs, 0, grid.Nx)
    ys = jnp.mod(ys, grid.Ny) if ns_periodic else jnp.clip(ys, 0, grid.Ny)
    pf = fields_fw[:, xs][:, :, ys]              # [F, GX+2W, GY+2W]
    PX, PY = pf.shape[1], pf.shape[2]

    # TPU gathers are issue-rate bound, so the window fetch must be few
    # LARGE gathers: dynamic slicing per floe is hopeless (an [F, W, W]
    # 3-D dynamic_slice under vmap lowered to 20M per-element gathers;
    # (1, W*F) contiguous runs under nested vmap were 10x worse still).
    # Instead build a REGULAR tile table: tiles of T = S + W nodes at
    # integer stride S = W//2, so every W-window with arbitrary base lies
    # in exactly ONE tile (bxp in [tx*S, tx*S + S) => window ends before
    # tx*S + T).  Table construction is static-index slicing (cheap, a
    # few MB); each floe then fetches its whole [T, T, F] window
    # neighborhood with ONE row gather.
    S = max(W // 2, 1)
    T = S + W
    ntx = (PX - W) // S + 1
    nty = (PY - W) // S + 1
    pf2 = jnp.transpose(pf, (1, 2, 0))           # [PX, PY, F]
    pf2 = jnp.pad(pf2, ((0, S), (0, S), (0, 0)))
    x_take = jnp.arange(ntx)[:, None] * S + jnp.arange(T)[None, :]
    y_take = jnp.arange(nty)[:, None] * S + jnp.arange(T)[None, :]
    tiles = pf2[x_take][:, :, y_take]            # [ntx, T, nty, T, F]
    tiles = jnp.transpose(tiles, (0, 2, 1, 3, 4)).reshape(
        ntx * nty, T * T * F
    )

    fcx = (centroid[:, 0] - grid.x0) / grid.dx
    fcy = (centroid[:, 1] - grid.y0) / grid.dy
    bx0 = jnp.floor(fcx).astype(jnp.int32) - (W // 2 - 1)
    by0 = jnp.floor(fcy).astype(jnp.int32) - (W // 2 - 1)
    # clamp into the padded array (inactive floes may hold garbage)
    bxp = jnp.clip(bx0 + W, 0, PX - W)
    byp = jnp.clip(by0 + W, 0, PY - W)
    tx = bxp // S
    ty = byp // S
    win = tiles[tx * nty + ty].reshape(
        centroid.shape[0], T, T * F
    )                                            # one row gather per floe
    dx0 = bxp - tx * S                           # window base within tile
    dy0 = byp - ty * S

    fx = (px - grid.x0) / grid.dx
    fy = (py - grid.y0) / grid.dy
    ix = jnp.floor(fx)
    iy = jnp.floor(fy)
    wx = (fx - ix).astype(dtype)
    wy = (fy - iy).astype(dtype)
    # node index local to the W-window (coverage check), then shifted to
    # TILE-local coordinates for the stencil contraction
    lx = ix.astype(jnp.int32) - (bxp - W)[:, None]
    ly = iy.astype(jnp.int32) - (byp - W)[:, None]
    ovf = (lx < 0) | (lx > W - 2) | (ly < 0) | (ly > W - 2)
    lx = jnp.clip(lx, 0, W - 2) + dx0[:, None]
    ly = jnp.clip(ly, 0, W - 2) + dy0[:, None]
    ar = jnp.arange(T, dtype=jnp.int32)
    ex0 = ar[None, :, None] == lx[:, None, :]
    ex1 = ar[None, :, None] == (lx + 1)[:, None, :]
    ax = (
        ex0 * (1 - wx)[:, None, :] + ex1 * wx[:, None, :]
    )                                            # [N, T, P] weight stencil
    ey0 = ar[None, :, None] == ly[:, None, :]
    ey1 = ar[None, :, None] == (ly + 1)[:, None, :]
    ay = ey0 * (1 - wy)[:, None, :] + ey1 * wy[:, None, :]
    # x-contraction on the MXU with the P axis minor throughout ([N,TF,P]
    # then [N,F,P] - minor dims of T or F would pad to 128-lane tiles),
    # then the y-contraction as an elementwise reduce over the T axis
    t1 = jax.lax.dot_general(
        win, ax, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=win.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )                                            # [N, T*F, P]
    t1 = t1.reshape(t1.shape[0], T, F, t1.shape[-1])
    vals = jnp.sum(t1 * ay[:, :, None, :], axis=1)   # [N, F, P]
    return vals, ovf


class OneWayResult(NamedTuple):
    floes: FloeState
    # per-point data retained for two-way coupling
    pt_x: jnp.ndarray        # [N, P] world x of sub-floe points
    pt_y: jnp.ndarray
    pt_mask: jnp.ndarray     # [N, P] in-bounds & active & < nsub
    pt_tau_x_ocn: jnp.ndarray  # [N, P] ocean-on-ice stress at point
    pt_tau_y_ocn: jnp.ndarray
    pt_cell: jnp.ndarray     # [N, P] flattened line-centered cell index
    window_ovf: jnp.ndarray  # [] windowed-interp coverage overflow


def calc_one_way_coupling(
    floes: FloeState,
    grid: RegRectilinearGrid,
    domain: Domain,
    ocean: OceanState,
    atmos: AtmosState,
    consts: Constants,
    window: int | None = None,
) -> OneWayResult:
    """One-way (ocean/atmos -> floe) forcing (coupling.jl:1180-1300).

    ``window``: node-window width for the TPU fast-path interpolation
    (see _windowed_interp); None falls back to the generic per-point
    ``_bilinear`` gathers (identical values up to f32 product ordering).
    """
    N, P = floes.sub_x.shape
    act = floes.active

    # world-frame sub-floe points (calc_subfloe_values!, coupling.jl:627-657)
    ca = jnp.cos(floes.alpha)[:, None]
    sa = jnp.sin(floes.alpha)[:, None]
    px = ca * floes.sub_x - sa * floes.sub_y + floes.centroid[:, 0:1]
    py = sa * floes.sub_x + ca * floes.sub_y + floes.centroid[:, 1:2]

    pmask = jnp.arange(P)[None, :] < floes.nsub[:, None]
    # in_bounds (coupling.jl:494-597): off-grid only allowed through
    # periodic directions
    if not domain.ew_periodic:
        pmask = pmask & (px >= grid.x0) & (px <= grid.xf)
    if not domain.ns_periodic:
        pmask = pmask & (py >= grid.y0) & (py <= grid.yf)
    pmask = pmask & act[:, None]

    npoints = jnp.sum(pmask, axis=1)
    np_safe = jnp.maximum(npoints, 1)

    window_ovf = jnp.asarray(False)
    if window is not None:
        stacked_fw = jnp.stack(
            [atmos.u, atmos.v, ocean.u, ocean.v, ocean.hflx_factor], axis=0
        )
        vals_fp, pt_ovf = _windowed_interp(
            stacked_fw, px, py, floes.centroid, grid,
            domain.ew_periodic, domain.ns_periodic, window,
        )  # [N, 5, P] - one window gather + two MXU contractions
        uatm, vatm, uocn, vocn, hflx = (
            vals_fp[:, k, :] for k in range(5)
        )
        window_ovf = jnp.any(pt_ovf & pmask)
    else:
        stacked = jnp.stack(
            [atmos.u, atmos.v, ocean.u, ocean.v, ocean.hflx_factor], axis=-1
        )
        vals = _bilinear(
            stacked, px, py, grid, domain.ew_periodic, domain.ns_periodic
        )  # [N, P, 5] - one set of gathers for all five fields
        uatm, vatm, uocn, vocn, hflx = (vals[..., k] for k in range(5))

    # rigid-body point velocities
    xc = px - floes.centroid[:, 0:1]
    yc = py - floes.centroid[:, 1:2]
    upoint = floes.u[:, None] - floes.xi[:, None] * yc
    vpoint = floes.v[:, None] + floes.xi[:, None] * xc

    # atmosphere drag (calc_atmosphere_forcing, coupling.jl:1212-1232)
    du_ai = uatm - upoint
    dv_ai = vatm - vpoint
    nrm_a = jnp.sqrt(du_ai**2 + dv_ai**2)
    tx_atm = consts.rho_a * consts.Cd_ia * nrm_a * du_ai
    ty_atm = consts.rho_a * consts.Cd_ia * nrm_a * dv_ai

    # ocean drag + pressure gradient (calc_ocean_forcing!, coupling.jl:1277-1299)
    area_safe = jnp.where(floes.area > 0, floes.area, 1.0)
    ma_ratio = (floes.mass / area_safe)[:, None]
    du_oi = uocn - upoint
    dv_oi = vocn - vpoint
    nrm_o = jnp.sqrt(du_oi**2 + dv_oi**2)
    ct, st = jnp.cos(consts.turn_angle), jnp.sin(consts.turn_angle)
    tx_ocn = consts.rho_o * consts.Cd_io * nrm_o * (ct * du_oi - st * dv_oi)
    ty_ocn = consts.rho_o * consts.Cd_io * nrm_o * (st * du_oi + ct * dv_oi)
    tx_pgrad = -ma_ratio * consts.f * vocn
    ty_pgrad = ma_ratio * consts.f * uocn

    tx = tx_atm + tx_pgrad + tx_ocn
    ty = ty_atm + ty_pgrad + ty_ocn
    trq = (-tx * yc + ty * xc)  # (-tx sin(th) + ty cos(th)) * rad

    msum = lambda x: jnp.sum(jnp.where(pmask, x, 0.0), axis=1)
    # Coriolis contribution: constant per point (coupling.jl:1522-1525)
    cor_x = ma_ratio[:, 0] * consts.f * floes.v
    cor_y = -(ma_ratio[:, 0] * consts.f * floes.u)
    tot_tx = msum(tx) + npoints * cor_x
    tot_ty = msum(ty) + npoints * cor_y
    tot_trq = msum(trq)
    tot_hflx = msum(hflx)

    fx_oa = tot_tx / np_safe * floes.area
    fy_oa = tot_ty / np_safe * floes.area
    trq_oa = tot_trq / np_safe * floes.area
    hflx_factor = tot_hflx / np_safe

    # floes with zero in-bounds points are marked remove (coupling.jl:1507-1508)
    remove = floes.remove | (act & (npoints == 0))

    new_floes = floes._replace(
        fx_oa=jnp.where(act, fx_oa, floes.fx_oa),
        fy_oa=jnp.where(act, fy_oa, floes.fy_oa),
        trq_oa=jnp.where(act, trq_oa, floes.trq_oa),
        hflx_factor=jnp.where(act, hflx_factor, floes.hflx_factor),
        remove=remove,
    )

    # line-centered cell index per point, with periodic shift
    # (find_center_cell_index + shift_cell_idx, coupling.jl:466-470, 1154-1178)
    cxi = jnp.floor((px - grid.x0) / grid.dx + 0.5).astype(jnp.int32)
    cyi = jnp.floor((py - grid.y0) / grid.dy + 0.5).astype(jnp.int32)
    if domain.ew_periodic:
        cxi = jnp.mod(cxi, grid.Nx)
    else:
        cxi = jnp.clip(cxi, 0, grid.Nx)
    if domain.ns_periodic:
        cyi = jnp.mod(cyi, grid.Ny)
    else:
        cyi = jnp.clip(cyi, 0, grid.Ny)
    cell = cxi * (grid.Ny + 1) + cyi

    return OneWayResult(
        floes=new_floes,
        pt_x=px,
        pt_y=py,
        pt_mask=pmask,
        pt_tau_x_ocn=tx_ocn,
        pt_tau_y_ocn=ty_ocn,
        pt_cell=cell,
        window_ovf=window_ovf,
    )


def _floe_cell_areas(floes, grid, domain, cell_cap, cx0, cy0, offs):
    """Per-floe cell window + exact ice area per window cell.

    Shared by the point-based two-way coupling and the Eulerian OA mode:
    a cell_cap x cell_cap window of line-centered cells around each floe's
    centroid, with the floe's polygon clipped against every cell rect
    (closed-form clamped-shoelace, exact for the axis-aligned convex cell).
    Returns (wx, wy, wxs, wys, pair_ok, w_area): unshifted window indices,
    periodic-shifted/clamped indices, validity, and ice area per cell."""
    N = floes.centroid.shape[0]
    wx = cx0[:, None] + offs[None, :]      # [N, cap]
    wy = cy0[:, None] + offs[None, :]
    # shift (periodic) or clamp-invalid (non-periodic)
    if domain.ew_periodic:
        wxs = jnp.mod(wx, grid.Nx)
        wx_ok = jnp.ones_like(wx, bool)
    else:
        wxs = jnp.clip(wx, 0, grid.Nx)
        wx_ok = (wx >= 0) & (wx <= grid.Nx)
    if domain.ns_periodic:
        wys = jnp.mod(wy, grid.Ny)
        wy_ok = jnp.ones_like(wy, bool)
    else:
        wys = jnp.clip(wy, 0, grid.Ny)
        wy_ok = (wy >= 0) & (wy <= grid.Ny)

    # only cells within the floe's bounding circle need clipping
    cell_x = grid.x0 + wx * grid.dx        # unshifted cell center x
    cell_y = grid.y0 + wy * grid.dy
    rcell = 0.5 * jnp.sqrt(grid.dx**2 + grid.dy**2)
    near_x = jnp.abs(cell_x - floes.centroid[:, 0:1]) <= floes.rmax[:, None] + rcell
    near_y = jnp.abs(cell_y - floes.centroid[:, 1:2]) <= floes.rmax[:, None] + rcell

    pair_ok = (
        floes.active[:, None, None]
        & (wx_ok & near_x)[:, :, None]
        & (wy_ok & near_y)[:, None, :]
    )  # [N, cap, cap]

    # cell polygon (line-centered, trimmed at non-periodic boundaries:
    # center_cell_coords + check_cell_bounds, coupling.jl:931-1140)
    def cell_rect(ix_u, iy_u):
        # unshifted indices -> world rect, then trim
        xmin = (ix_u - 0.5) * grid.dx + grid.x0
        xmax = xmin + grid.dx
        ymin = (iy_u - 0.5) * grid.dy + grid.y0
        ymax = ymin + grid.dy
        if not domain.ew_periodic:
            xmin = jnp.clip(xmin, grid.x0, grid.xf)
            xmax = jnp.clip(xmax, grid.x0, grid.xf)
        if not domain.ns_periodic:
            ymin = jnp.clip(ymin, grid.y0, grid.yf)
            ymax = jnp.clip(ymax, grid.y0, grid.yf)
        return xmin, xmax, ymin, ymax

    V = floes.max_verts

    # flatten pairs and clip floe against each cell rect via S-H (the cell is
    # convex, so successive half-plane clipping is exact for area)
    ix_u = jnp.broadcast_to(wx[:, :, None], (N, cell_cap, cell_cap))
    iy_u = jnp.broadcast_to(wy[:, None, :], (N, cell_cap, cell_cap))
    xmin, xmax, ymin, ymax = cell_rect(ix_u, iy_u)

    # pool-level small-ring fast path (same trick as two_cross_dispatch):
    # Voronoi floes carry ~6-12 vertices vs the 32-slot padding; run the
    # edge sweep on the first-16 slice when every ring fits
    if V > 16:
        area_in_cell = jax.lax.cond(
            jnp.max(jnp.where(floes.active, floes.nverts, 0)) <= 16,
            lambda: _clip_area_to_rects(
                floes.verts[:, :16], floes.nverts, xmin, xmax, ymin, ymax,
                pair_ok,
            ),
            lambda: _clip_area_to_rects(
                floes.verts, floes.nverts, xmin, xmax, ymin, ymax, pair_ok
            ),
        )
    else:
        area_in_cell = _clip_area_to_rects(
            floes.verts, floes.nverts, xmin, xmax, ymin, ymax, pair_ok
        )  # [N, cap, cap]

    w_area = jnp.where(pair_ok & (area_in_cell > 0), area_in_cell, 0.0)
    return wx, wy, wxs, wys, pair_ok, w_area


def calc_eulerian_oa_coupling(
    floes: FloeState,
    grid: RegRectilinearGrid,
    domain: Domain,
    ocean: OceanState,
    atmos: AtmosState,
    consts: Constants,
    cell_cap: int,
):
    """Eulerian (grid-cell) OA forcing - the working version of the
    reference's dormant eulerian_OA_code.jl (floe_OA_forcings!, :121-179):
    instead of sub-floe quadrature points, each floe integrates drag over
    the grid cells it covers, weighted by the EXACT ice area in each cell.

    Faithful to the reference's formulas: atmosphere drag uses the raw
    atmosphere velocity (not relative to ice), ocean drag is relative with
    the turning-angle rotation, pressure-gradient and Coriolis terms use
    mass/area, torque arms run to the cell centers, and the floe heatflux
    factor is the mean over covered cells.  Returns the floe pool with
    fx_oa/fy_oa/trq_oa/hflx_factor filled in.
    """
    N = floes.capacity
    dtype = floes.verts.dtype
    cx0 = jnp.floor(
        (floes.centroid[:, 0] - grid.x0) / grid.dx + 0.5
    ).astype(jnp.int32)
    cy0 = jnp.floor(
        (floes.centroid[:, 1] - grid.y0) / grid.dy + 0.5
    ).astype(jnp.int32)
    half = cell_cap // 2
    offs = jnp.arange(cell_cap) - half
    wx, wy, wxs, wys, pair_ok, w_area = _floe_cell_areas(
        floes, grid, domain, cell_cap, cx0, cy0, offs
    )
    covered = w_area > 0                                   # [N, cap, cap]

    # field values at the (shifted) cell centers: flat 1-D gathers
    NCy = grid.Ny + 1
    flat = (wxs[:, :, None] * NCy + wys[:, None, :]).reshape(N, -1)

    def at_cells(f):
        return f.reshape(-1)[flat].reshape(N, cell_cap, cell_cap)

    uo = at_cells(ocean.u)
    vo = at_cells(ocean.v)
    ua = at_cells(atmos.u)
    va = at_cells(atmos.v)
    hflx = at_cells(ocean.hflx_factor)

    # torque arms to UNSHIFTED cell centers (periodic images stay on the
    # floe's side of the seam)
    lx = grid.x0 + wx[:, :, None] * grid.dx - floes.centroid[:, 0, None, None]
    ly = grid.y0 + wy[:, None, :] * grid.dy - floes.centroid[:, 1, None, None]

    # ice velocity at each cell center (rigid body)
    uice = floes.u[:, None, None] - ly * floes.xi[:, None, None]
    vice = floes.v[:, None, None] + lx * floes.xi[:, None, None]

    ma_ratio = jnp.where(
        floes.area > 0, floes.mass / jnp.where(floes.area > 0, floes.area, 1.0), 0.0
    )[:, None, None]

    # atmosphere drag (raw atmosphere velocity - eulerian_OA_code.jl:141-143)
    na = jnp.sqrt(ua * ua + va * va)
    fx = consts.rho_a * consts.Cd_ia * na * ua * w_area
    fy = consts.rho_a * consts.Cd_ia * na * va * w_area

    # pressure gradient (:146-147)
    fx = fx - ma_ratio * consts.f * vo * w_area
    fy = fy + ma_ratio * consts.f * uo * w_area

    # ocean drag with turning angle (:150-155)
    du = uo - uice
    dv = vo - vice
    nn = jnp.sqrt(du * du + dv * dv)
    ct = jnp.cos(consts.turn_angle)
    st = jnp.sin(consts.turn_angle)
    tau_x = consts.rho_o * consts.Cd_io * nn * (ct * du - st * dv)
    tau_y = consts.rho_o * consts.Cd_io * nn * (st * du + ct * dv)
    fx = fx + tau_x * w_area
    fy = fy + tau_y * w_area

    # torque BEFORE Coriolis (:159-160; Coriolis acts at the centroid)
    trq = lx * fy - ly * fx

    # Coriolis (:163-164)
    fx = fx + ma_ratio * consts.f * floes.v[:, None, None] * w_area
    fy = fy - ma_ratio * consts.f * floes.u[:, None, None] * w_area

    fx_oa = jnp.sum(jnp.where(covered, fx, 0.0), axis=(1, 2))
    fy_oa = jnp.sum(jnp.where(covered, fy, 0.0), axis=(1, 2))
    trq_oa = jnp.sum(jnp.where(covered, trq, 0.0), axis=(1, 2))
    ncov = jnp.sum(covered.astype(dtype), axis=(1, 2))
    hflx_floe = jnp.sum(jnp.where(covered, hflx, 0.0), axis=(1, 2)) / jnp.where(
        ncov > 0, ncov, 1.0
    )

    act = floes.active
    return floes._replace(
        fx_oa=jnp.where(act, fx_oa, 0.0),
        fy_oa=jnp.where(act, fy_oa, 0.0),
        trq_oa=jnp.where(act, trq_oa, 0.0),
        hflx_factor=jnp.where(act, hflx_floe, 0.0),
    )


def calc_two_way_coupling(
    one_way: OneWayResult,
    grid: RegRectilinearGrid,
    domain: Domain,
    ocean: OceanState,
    atmos: AtmosState,
    consts: Constants,
    floe_settings: FloeSettings,
    dt: float,
    cell_cap: int,
    axis_name: str | None = None,
):
    """Ice/atmosphere effect on the ocean (coupling.jl:1617-1680).

    cell_cap: static max number of line-centered cells a floe can cover in
    each direction (chosen at simulation build from max floe radius).
    axis_name: when running inside shard_map with the floe pool sharded over
    a device mesh axis, per-cell sums from local floes are psum-reduced over
    that axis so the resulting ocean state is replicated-consistent.

    Returns (ocean, overflow): ``overflow`` fires when any valid subfloe
    point of a floe falls outside that floe's cell_cap x cell_cap window -
    its stress deposition would be silently lost (the reference's
    CellStresses accumulates every point, coupling.jl:1329-1384), so the
    caller must surface it and cell_cap must be raised (floes can outgrow
    the initial sizing through welding/fusing).
    """
    floes = one_way.floes
    N, P = one_way.pt_x.shape
    NCx, NCy = grid.Nx + 1, grid.Ny + 1
    C = NCx * NCy

    # candidate covered cells per floe: a cell_cap x cell_cap window of
    # line-centered cells around the floe centroid
    cx0 = jnp.floor((floes.centroid[:, 0] - grid.x0) / grid.dx + 0.5).astype(jnp.int32)
    cy0 = jnp.floor((floes.centroid[:, 1] - grid.y0) / grid.dy + 0.5).astype(jnp.int32)
    half = cell_cap // 2
    offs = jnp.arange(cell_cap) - half

    # per-(floe, window-cell) sums of -tau_ocn and point counts, accumulated
    # directly in window coordinates: O(N * cell_cap^2) state instead of the
    # O(N * grid) per-(floe,cell) buffers (CellStresses, oceans.jl:4-8) -
    # this keeps each device's two-way work independent of the global grid
    # in the decomposed path.
    pxi = jnp.floor((one_way.pt_x - grid.x0) / grid.dx + 0.5).astype(jnp.int32)
    pyi = jnp.floor((one_way.pt_y - grid.y0) / grid.dy + 0.5).astype(jnp.int32)
    kx = pxi - (cx0[:, None] - half)
    ky = pyi - (cy0[:, None] - half)
    in_win = (kx >= 0) & (kx < cell_cap) & (ky >= 0) & (ky < cell_cap)
    win_overflow = jnp.any(one_way.pt_mask & ~in_win)
    wmask = one_way.pt_mask & in_win
    # separable per-axis one-hot deposition (CellStresses' add_point!,
    # oceans.jl:4-8, coupling.jl:1329-1384): y-axis one-hot broadcast onto
    # the payload, then ONE batched MXU contraction over points with the
    # x-axis one-hot.  Replaces the joint [N, P, cap^2] window one-hot
    # (2.1 GB of HBM traffic at N=8k, grid 200x200) with two [N, P, cap]
    # one-hots and a [N, P, cap*3] intermediate - ~6x less traffic.  A
    # segment_sum here serializes on TPU.  HIGHEST precision keeps the
    # f32 contraction exact (TPU matmuls default to a lossy bf16 pass).
    dtypef = one_way.pt_x.dtype
    ar = jnp.arange(cell_cap, dtype=jnp.int32)
    # one-hots laid out [N, cap, P] with the long P axis minor: the former
    # [N, P, cap] layout put the 15-wide cap axis in the lane dimension,
    # padding every tile to 128 lanes (~8.5x HBM traffic on each operand)
    ohx = (
        (kx[:, None, :] == ar[None, :, None]) & wmask[:, None, :]
    ).astype(dtypef)                             # [N, cap, P]
    ohy = (ky[:, None, :] == ar[None, :, None]).astype(dtypef)
    payload = jnp.stack(
        [
            -one_way.pt_tau_x_ocn,
            -one_way.pt_tau_y_ocn,
            jnp.ones_like(one_way.pt_x),
        ],
        axis=1,
    )  # [N, 3, P]; masked points drop out through the ohx zero rows
    z = (ohy[:, :, None, :] * payload[:, None, :, :]).reshape(
        N, cell_cap * 3, P
    )
    sums = jax.lax.dot_general(
        ohx, z, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=dtypef,
        precision=jax.lax.Precision.HIGHEST,
    )  # [N, cap, cap*3]
    sums = sums.reshape(N, cell_cap, cell_cap, 3)
    tx_pair = sums[..., 0]
    ty_pair = sums[..., 1]
    np_pair = sums[..., 2]
    np_pair_safe = jnp.where(np_pair > 0, np_pair, 1.0)
    wx, wy, wxs, wys, pair_ok, w_area = _floe_cell_areas(
        floes, grid, domain, cell_cap, cx0, cy0, offs
    )
    # separable matmul scatter onto the grid: window columns/rows are
    # one-hot-matched per axis and contracted on the MXU.  Replaces a
    # [N*cap^2, 3] segment_sum whose serialized scatter rows cost 39.9 ms
    # at N=8016 on TPU v5e (matmul form: 2.8 ms).  HIGH precision keeps
    # the f32 products near-exact (bf16x3); invalid window cells carry
    # w_area == 0 so their (clamped) indices contribute nothing.
    cell_pay = jnp.stack(
        [
            tx_pair / np_pair_safe * w_area,
            ty_pair / np_pair_safe * w_area,
            w_area,
        ],
        axis=-1,
    )  # [N, cap, cap, 3]
    dtypef = cell_pay.dtype
    # grid one-hots and the step-1 output keep the long grid axis minor
    # ([N, cap, NCx] / [N, cap*3, NCx]): the former [N, NCx, cap] layout
    # padded the cap-wide minor to 128 lanes (2.3 GB of one-hot at N=16k)
    gx = jnp.arange(NCx, dtype=jnp.int32)
    A = (wxs[:, :, None] == gx[None, None, :]).astype(dtypef)  # [N, cap, NCx]
    step1 = jax.lax.dot_general(
        cell_pay.reshape(N, cell_cap, cell_cap * 3), A,
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=dtypef,
        precision=jax.lax.Precision.HIGH,
    )  # [N, cap*3, NCx]
    gy = jnp.arange(NCy, dtype=jnp.int32)
    B = (wys[:, :, None] == gy[None, None, :]).astype(dtypef)  # [N, cap, NCy]
    cell_sums = jnp.einsum(
        "ncfg,nch->ghf", step1.reshape(N, cell_cap, 3, NCx), B,
        precision=jax.lax.Precision.HIGH,
        preferred_element_type=dtypef,
    ).reshape(C, 3)

    if axis_name is not None:
        # cross-shard reduction BEFORE the area-weighted division (the
        # division is nonlinear, so partial sums must be combined first)
        cell_sums = jax.lax.psum(cell_sums, axis_name)
    tau_x_cell = cell_sums[:, 0]
    tau_y_cell = cell_sums[:, 1]
    ice_area_cell = cell_sums[:, 2]

    tau_x = jnp.where(ice_area_cell > 0, tau_x_cell / jnp.where(ice_area_cell > 0, ice_area_cell, 1.0), 0.0)
    tau_y = jnp.where(ice_area_cell > 0, tau_y_cell / jnp.where(ice_area_cell > 0, ice_area_cell, 1.0), 0.0)
    cell_area = grid.dx * grid.dy
    si_frac = (ice_area_cell / cell_area).reshape(NCx, NCy)
    tau_x = tau_x.reshape(NCx, NCy)
    tau_y = tau_y.reshape(NCx, NCy)

    # atmosphere-on-open-water drag (coupling.jl:1669-1674)
    du_ao = atmos.u - ocean.u
    dv_ao = atmos.v - ocean.v
    nrm = jnp.sqrt(du_ao**2 + dv_ao**2)
    ocn_frac = 1.0 - si_frac
    tau_x = tau_x + consts.rho_a * consts.Cd_ao * ocn_frac * nrm * du_ao
    tau_y = tau_y + consts.rho_a * consts.Cd_ao * ocn_frac * nrm * dv_ao

    # heatflux factor (coupling.jl:1676-1677)
    hflx = dt * consts.k / (floe_settings.rho_i * consts.L) * (ocean.temp - atmos.temp)

    ocean = ocean._replace(
        tau_x=tau_x.astype(ocean.tau_x.dtype),
        tau_y=tau_y.astype(ocean.tau_y.dtype),
        si_frac=si_frac.astype(ocean.si_frac.dtype),
        hflx_factor=hflx.astype(ocean.hflx_factor.dtype),
    )
    return ocean, win_overflow


def _clip_area_to_rects(verts, nverts, xmin, xmax, ymin, ymax, ok):
    """Area of each floe polygon inside each axis-aligned rect.

    verts [N,V,2], nverts [N]; rect bounds and ok mask are [N, a, b].

    Closed-form clamped-image shoelace (replaces a Sutherland-Hodgman
    formulation whose per-half-plane argsort compaction was ~1 s for the
    500-floe x 15x15-window batch on TPU): the ring's continuous image under
    the retraction (x, y) -> (clamp(x, x0, x1), clamp(y, y0, y1)) traverses
    the boundary of P intersect B plus zero-area runs along the box edges,
    so its signed area IS area(P intersect B).  Each polygon edge's image is
    a <= 5-segment polyline bent where x(t)/y(t) cross the four box lines;
    since any point clamp(p(t)) lies on that polyline at parameter t,
    inserting the four (sorted, clamped-to-[0,1]) crossing parameters as
    vertices is exact even when a crossing does not occur.  Everything is
    elementwise - no sorts (beyond a 4-value min/max network), gathers, or
    compaction - so the whole [N, a, b, V] batch is one fused VPU pass.
    """
    N, V, _ = verts.shape
    A, B = xmin.shape[1], xmin.shape[2]
    C = A * B
    dtype = verts.dtype

    # closed-ring edges per floe: [N, V]
    ex1 = verts[..., 0]
    ey1 = verts[..., 1]
    idx = jnp.arange(V)
    nsafe = jnp.maximum(nverts, 1)
    wrap = idx[None, :] == (nsafe[:, None] - 1)
    ex2 = jnp.where(wrap, ex1[:, 0:1], jnp.roll(ex1, -1, axis=1))
    ey2 = jnp.where(wrap, ey1[:, 0:1], jnp.roll(ey1, -1, axis=1))
    em = (idx[None, :] < nverts[:, None]).astype(dtype)

    # broadcast layout [N, V, C]: edges in sublanes, cells in lanes
    x1 = ex1[:, :, None]
    y1 = ey1[:, :, None]
    x2 = ex2[:, :, None]
    y2 = ey2[:, :, None]
    x0c = xmin.reshape(N, 1, C)
    x1c = xmax.reshape(N, 1, C)
    y0c = ymin.reshape(N, 1, C)
    y1c = ymax.reshape(N, 1, C)

    dx = x2 - x1
    dy = y2 - y1
    dxs = jnp.where(dx == 0, 1.0, dx)
    dys = jnp.where(dy == 0, 1.0, dy)
    ta = jnp.clip((x0c - x1) / dxs, 0.0, 1.0)
    tb = jnp.clip((x1c - x1) / dxs, 0.0, 1.0)
    tc = jnp.clip((y0c - y1) / dys, 0.0, 1.0)
    td = jnp.clip((y1c - y1) / dys, 0.0, 1.0)
    # 4-value sort network
    lo1, hi1 = jnp.minimum(ta, tb), jnp.maximum(ta, tb)
    lo2, hi2 = jnp.minimum(tc, td), jnp.maximum(tc, td)
    t1 = jnp.minimum(lo1, lo2)
    t4 = jnp.maximum(hi1, hi2)
    m1, m2 = jnp.maximum(lo1, lo2), jnp.minimum(hi1, hi2)
    t2 = jnp.minimum(m1, m2)
    t3 = jnp.maximum(m1, m2)

    def pt(t):
        px = jnp.clip(x1 + t * dx, x0c, x1c)
        py = jnp.clip(y1 + t * dy, y0c, y1c)
        return px, py

    zero = jnp.zeros_like(t1)
    one_ = jnp.ones_like(t1)
    acc = None
    prev = pt(zero)
    for t in (t1, t2, t3, t4, one_):
        cur = pt(t)
        cr = prev[0] * cur[1] - cur[0] * prev[1]
        acc = cr if acc is None else acc + cr
        prev = cur
    area = 0.5 * jnp.sum(acc * em[:, :, None], axis=1)  # [N, C]
    area = area.reshape(N, A, B)
    return jnp.where(ok, jnp.abs(area), 0.0)


def timestep_coupling(
    floes: FloeState,
    grid: RegRectilinearGrid,
    domain: Domain,
    ocean: OceanState,
    atmos: AtmosState,
    consts: Constants,
    coupling_settings: CouplingSettings,
    floe_settings: FloeSettings,
    dt: float,
    cell_cap: int = 16,
    axis_name: str | None = None,
):
    """timestep_coupling! (coupling.jl:1705-1738).

    Returns (floes, ocean, overflow); overflow fires when two-way stress
    deposition was truncated by the cell_cap window (see
    calc_two_way_coupling)."""
    if coupling_settings.eulerian:
        # Eulerian OA mode (eulerian_OA_code.jl, dormant in the reference):
        # grid-cell forcing instead of sub-floe quadrature points.  The
        # point-based two-way deposition needs points, so two-way stays a
        # point-path feature; the reference never wired eulerian two-way
        # either.
        floes = calc_eulerian_oa_coupling(
            floes, grid, domain, ocean, atmos, consts, cell_cap
        )
        return floes, ocean, jnp.asarray(False)
    # the interp node window reuses the two-way cell window's floe-coverage
    # guarantee (cell_cap is sized to 2*ceil(1.5*rmax/dx)+3 at build and
    # regrown with it); +1 node because W nodes bound W-1 cells.  Configs
    # whose floes span a large fraction of the grid (huge cell_cap) keep
    # the generic per-point gathers - the window would be the whole grid.
    W = cell_cap + 1
    ow = calc_one_way_coupling(
        floes, grid, domain, ocean, atmos, consts,
        window=W if W <= 32 else None,
    )
    overflow = ow.window_ovf
    if coupling_settings.two_way_coupling_on:
        ocean, ovf2 = calc_two_way_coupling(
            ow, grid, domain, ocean, atmos, consts, floe_settings, dt,
            cell_cap, axis_name,
        )
        overflow = overflow | ovf2
    return ow.floes, ocean, overflow
