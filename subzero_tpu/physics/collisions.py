"""Collisions: floe-floe, floe-wall, floe-topography contact forces.

TPU-native redesign of /root/reference/src/physical_processes/collisions.jl.
Key departures from the reference (same physics, hardware-shaped):

  * **No ghost floes.** Periodic wrap is a *minimum-image shift* carried on
    each candidate pair: floe j is translated by (±Lx, ±Ly) inside the pair
    kernel, and its reaction forces are shifted back - exactly reproducing
    the reference's ghost create/compute/fold-back pipeline
    (collisions.jl:866-1174, 830-862) with zero data motion.
  * **Symmetric pairwise forces.** Each unordered candidate pair is computed
    once; +F is scattered to floe i and -F to floe j by segment-sum, which
    replaces the reference's serial reaction pass (collisions.jl:799-828)
    and is order-independent and deterministic.
  * **One batched pair kernel.** Floes, the four domain walls, and
    topography elements form a single "Q pool"; all candidate pairs run
    through the same fixed-shape intersection kernel (geometry/clip.py) and
    the Hopkins elastic + Coulomb friction force recipe
    (calc_elastic_forces / calc_normal_force / calc_friction_forces,
    collisions.jl:30-283).
  * **Aggregates, not interaction lists.** The growable per-floe
    ``interactions`` matrices of the reference become segment-summed force,
    torque, stress-moment, and overlap-area accumulators.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import Constants
from ..core.domain import (
    BoundaryKind,
    Domain,
    EAST,
    NORTH,
    SOUTH,
    WEST,
    wall_rect,
)
from ..core.floes import FloeState
from ..geometry.clip import (
    ClipRegions,
    DEFAULT_CAP,
    count_crossings,
    intersect_regions,
    two_cross_dispatch,
)
from ..settings import CollisionSettings

# Q-pool layout: [0, N) floes, [N, N+4) walls (N,S,E,W), [N+4, N+4+T) topo
WALL_OFFSET = 0  # computed at runtime as N

# Pool size above which the narrow phase compacts the padded candidate list
# down to its valid pairs before gathering (see timestep_collisions).  Module
# constant so tests can exercise the compacted path at small N.  Disabled by
# default: at N=8016 (pair_cap 16N, ~28k valid of 128k rows) compaction
# measured net-NEGATIVE on TPU v5e (collisions 16.8 -> 18.2 ms) - the i-side
# row gathers + sized-nonzero it adds cost more than the j-side padding-row
# gathers it removes.  Kept (equivalence-tested) for pools where the valid
# fraction is far lower than 1/row_cap.
COMPACT_MIN_N = 1 << 30


class PairArrays(NamedTuple):
    qi: jnp.ndarray        # [PC] floe index i (P side)
    qj: jnp.ndarray        # [PC] Q-pool index
    shift: jnp.ndarray     # [PC, 2] translation applied to Q (periodic image)
    valid: jnp.ndarray     # [PC]
    overflow: jnp.ndarray  # [] bool: more candidates than capacity


def find_candidate_pairs(
    floes: FloeState,
    domain: Domain,
    pair_cap: int,
    bins: tuple | None = None,
    owned_rows: int | None = None,
) -> PairArrays:
    """Broad phase: bounding-circle tests over all i<j pairs plus walls and
    topography (potential_interaction, collisions.jl:705-710).

    Periodic wrap uses the minimum-image convention: the fold that brings
    floe j closest to floe i determines the single periodic image tested,
    and its shift vector is carried on the pair.  (Valid while every floe is
    smaller than half the domain, which the reference's ghost machinery also
    implicitly assumes for correctness of its one-ghost-per-direction copy.)

    ``bins``: optional static (nbx, nby, M) spatial binning parameters - when
    given, floe-floe candidates come from 3x3 neighborhoods of a spatial bin
    grid (O(N * M) instead of O(N^2)); M is the per-bin floe capacity.

    ``owned_rows``: when the pool is a distributed local block extended with
    halo copies (parallel/decomp.py), rows >= owned_rows are halos: pairs
    between two halo copies are the neighbor device's responsibility and are
    skipped entirely, and local-halo pairs are always owned by the local
    row (so halo rows consume no candidate budget).  None = every row owned.
    """
    if bins is not None:
        assert owned_rows is None, "binned broad phase is single-pool only"
        return _find_candidate_pairs_binned(floes, domain, pair_cap, bins)
    return _find_candidate_pairs_dense(floes, domain, pair_cap, owned_rows)


def _rank_select_rows(mask, row_cap, extra_cap=0):
    """Per-row compaction of a boolean [N, C] candidate matrix: sel[i, k] =
    column of the (k+1)-th True in row i (or C if the row has fewer).

    Two formulations, chosen by shape (tools/probe_rankselect.py, TPU v5e):

      * ``top_k`` over descending-priority keys - one fused op whose sort
        cost scales with C only; wins on wide rows (dense [N, ~N] masks).
      * cumsum rank + fused compare-reduce over [N, C, row_cap] - no sort;
        wins on the binned shapes (bin-member [NB, N] k=M: 2.25 -> 0.86 ms,
        neighborhood [N, 9M] k=16: 1.54 -> 0.31 ms) but loses when
        C * row_cap grows past ~10^6 per row block.

    ``extra_cap`` > 0 additionally compacts the candidates that did NOT fit
    their row (rank > row_cap) into a global second-chance list: rows hold
    the per-floe typical degree while the rare deep rows (dense contact
    clusters) spill here instead of being dropped.

    Returns (sel [N, row_cap] int32, valid [N, row_cap], overflow [],
    extra_pos [extra_cap] int32 flat positions into mask or N*C when
    unused) - overflow fires only when even the extra list truncates."""
    N, C = mask.shape
    col = jnp.arange(C, dtype=jnp.int32)
    row_tot = jnp.sum(mask.astype(jnp.int32), axis=1)
    if extra_cap > 0:
        # two-stage spill selection.  A flat nonzero over [N*C] lowers to a
        # serialized TPU scatter (measured 45 ms at [8016, 598]); instead:
        # (1) per-row compare-reduce picks up to D_SPILL dropped columns
        # (cheap [N, C, D] fused pass), (2) one small sized-nonzero over
        # [N * D_SPILL] compacts them globally.
        D_SPILL = 8
        n_drop = jnp.sum(
            jnp.minimum(jnp.maximum(row_tot - row_cap, 0), D_SPILL)
        )
        overflow = (n_drop > extra_cap) | jnp.any(
            row_tot > row_cap + D_SPILL
        )
        cs_d = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        rank_d = jnp.where(mask, cs_d - row_cap, 0)  # 1.. for spilled cols
        hitd = (
            rank_d[:, :, None]
            == (jnp.arange(D_SPILL, dtype=jnp.int32) + 1)[None, None, :]
        )
        dcols = jnp.sum(
            jnp.where(hitd, col[None, :, None], 0), axis=1, dtype=jnp.int32
        )  # [N, D_SPILL]
        dvalid = (
            jnp.arange(D_SPILL)[None, :]
            < jnp.maximum(row_tot - row_cap, 0)[:, None]
        )
        flat = jnp.where(
            dvalid, jnp.arange(N, dtype=jnp.int32)[:, None] * C + dcols,
            N * C,
        ).reshape(-1)
        (esel,) = jnp.nonzero(flat < N * C, size=extra_cap, fill_value=N * D_SPILL)
        extra_pos = jnp.where(
            esel < N * D_SPILL, flat[jnp.minimum(esel, N * D_SPILL - 1)], N * C
        ).astype(jnp.int32)
    else:
        overflow = jnp.any(row_tot > row_cap)
        extra_pos = jnp.full((0,), N * C, jnp.int32)
    # total compare-reduce work N*C*row_cap decides: the binned shapes sit
    # well below this, the large dense [N, ~N] masks above it
    if N * C * row_cap <= 3 << 27:
        cs = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        rank = cs * mask  # [N, C]; 0 on non-candidates
        hit = (
            rank[:, :, None]
            == (jnp.arange(row_cap, dtype=jnp.int32) + 1)[None, None, :]
        )
        sel = jnp.sum(
            jnp.where(hit, col[None, :, None], 0), axis=1, dtype=jnp.int32
        )
        valid = jnp.arange(row_cap)[None, :] < cs[:, -1:]
        sel = jnp.where(valid, sel, C)
        return sel, valid, overflow, extra_pos
    # key > 0 iff candidate; larger key = smaller column index
    key = jnp.where(mask, C - col, 0)
    if row_cap > C:  # tiny pools: top_k needs k <= width
        key = jnp.pad(key, ((0, 0), (0, row_cap - C)))
    topv, _ = jax.lax.top_k(key, row_cap)  # [N, row_cap], descending
    valid = topv > 0
    sel = jnp.where(valid, C - topv, C)
    return sel.astype(jnp.int32), valid, overflow, extra_pos


def _extra_cap(N):
    """Second-chance list capacity: spill slots for candidates beyond a
    floe's row_cap (dense contact clusters).  A fixed function of N so
    consumers can recover the list layout from PC alone:
    PC = N * row_cap + _extra_cap(N)."""
    return max(N // 2, 64)


def _wall_topo_masks(floes, domain):
    """Wall [N, 4] and topography [N, T] candidate masks."""
    c = floes.centroid
    r = floes.rmax
    act = floes.active
    vals = domain.vals
    beyond = jnp.stack(
        [
            c[:, 1] + r > vals[NORTH],
            c[:, 1] - r < vals[SOUTH],
            c[:, 0] + r > vals[EAST],
            c[:, 0] - r < vals[WEST],
        ],
        axis=1,
    )
    wall_force = jnp.asarray(
        [
            domain.kinds[w] in (BoundaryKind.COLLISION, BoundaryKind.MOVING)
            for w in range(4)
        ]
    )
    fw = act[:, None] & beyond & wall_force[None, :]
    T = domain.topography.count
    if T > 0:
        tc = domain.topography.centroid
        tr = domain.topography.rmax
        dt_ = c[:, None, :] - tc[None, :, :]
        ft = act[:, None] & (
            jnp.sum(dt_ * dt_, axis=-1) < (r[:, None] + tr[None, :]) ** 2
        )
    else:
        ft = jnp.zeros((floes.capacity, 0), bool)
    return fw, ft


def _find_candidate_pairs_dense(
    floes: FloeState,
    domain: Domain,
    pair_cap: int,
    owned_rows: int | None = None,
) -> PairArrays:
    N = floes.capacity
    c = floes.centroid
    r = floes.rmax
    act = floes.active

    Lx = domain.vals[EAST] - domain.vals[WEST]
    Ly = domain.vals[NORTH] - domain.vals[SOUTH]

    # floe-floe: [N, N] with min-image fold
    dx = c[:, None, 0] - c[None, :, 0]
    dy = c[:, None, 1] - c[None, :, 1]
    sx = jnp.zeros_like(dx)
    sy = jnp.zeros_like(dy)
    if domain.ew_periodic:
        fold = jnp.abs(dx) > Lx / 2
        sx = jnp.where(fold, jnp.sign(dx) * Lx, 0.0)
        dx = dx - sx
    if domain.ns_periodic:
        fold = jnp.abs(dy) > Ly / 2
        sy = jnp.where(fold, jnp.sign(dy) * Ly, 0.0)
        dy = dy - sy
    dist2 = dx * dx + dy * dy
    rsum = r[:, None] + r[None, :]
    iidx = jnp.arange(N)
    # balanced pair ownership: each unordered pair is computed exactly once,
    # assigned to i or j by (i+j) parity so per-row candidate counts stay
    # near deg/2 instead of piling onto low indices (halves row_cap needs)
    lt = iidx[:, None] < iidx[None, :]
    even = ((iidx[:, None] + iidx[None, :]) % 2) == 0
    own = (even == lt) & (iidx[:, None] != iidx[None, :])
    if owned_rows is not None:
        # extended distributed pool: halo-halo pairs are skipped (the
        # neighbor owning both floes computes them), local-halo pairs are
        # owned by the local row so halo rows carry no candidates at all
        loc_i = iidx[:, None] < owned_rows
        loc_j = iidx[None, :] < owned_rows
        own = jnp.where(loc_i & loc_j, own, loc_i & ~loc_j)
    pair_mask = act[:, None] & act[None, :] & (dist2 < rsum**2) & own

    fw, ft = _wall_topo_masks(floes, domain)
    T = domain.topography.count
    if owned_rows is not None:
        # halo copies also skip wall/topography contacts (owner computes)
        loc_rows = (iidx < owned_rows)[:, None]
        fw = fw & loc_rows
        ft = ft & loc_rows

    # unified candidate matrix over the Q pool: [NR, N+4+T] - NR = N unless
    # owned_rows restricts the row-structured list to the local block (halo
    # rows then carry no candidates and consume no pair budget)
    NR = N if owned_rows is None else owned_rows
    mask = jnp.concatenate([pair_mask, fw, ft], axis=1)[:NR]
    NQ = N + 4 + T
    row_cap = max(min(pair_cap // max(NR, 1), NQ), 8)
    E = _extra_cap(N)
    sel, valid, overflow, epos = _rank_select_rows(mask, row_cap, extra_cap=E)

    qi = jnp.broadcast_to(
        iidx[:NR, None], (NR, row_cap)
    ).reshape(-1).astype(jnp.int32)
    qj = jnp.minimum(sel, NQ - 1).reshape(-1).astype(jnp.int32)
    is_ff = qj < N
    jsafe = jnp.minimum(qj, N - 1)
    sxg = jnp.take_along_axis(
        sx[:NR], jsafe.reshape(NR, row_cap), axis=1
    ).reshape(-1)
    syg = jnp.take_along_axis(
        sy[:NR], jsafe.reshape(NR, row_cap), axis=1
    ).reshape(-1)
    shift = jnp.where(
        is_ff[:, None],
        jnp.stack([sxg, syg], axis=-1),
        0.0,
    )

    # second-chance block: flat positions into [NR, NQ]
    evalid = epos < NR * NQ
    eps_ = jnp.minimum(epos, NR * NQ - 1)
    ei = jnp.where(evalid, eps_ // NQ, N - 1).astype(jnp.int32)
    ecol = jnp.where(evalid, eps_ % NQ, N - 1).astype(jnp.int32)
    e_is_ff = ecol < N
    ejsafe = jnp.minimum(ecol, N - 1)
    esx = sx.reshape(-1)[ei * N + ejsafe]
    esy = sy.reshape(-1)[ei * N + ejsafe]
    eshift = jnp.where(
        (e_is_ff & evalid)[:, None], jnp.stack([esx, esy], axis=-1), 0.0
    )
    return PairArrays(
        qi=jnp.concatenate([qi, ei]),
        qj=jnp.concatenate([qj, jnp.minimum(ecol, NQ - 1)]),
        shift=jnp.concatenate([shift, eshift], axis=0),
        valid=jnp.concatenate([valid.reshape(-1), evalid]),
        overflow=overflow,
    )


def _find_candidate_pairs_binned(
    floes: FloeState,
    domain: Domain,
    pair_cap: int,
    bins: tuple,
) -> PairArrays:
    """O(N*M) broad phase: floes sorted into an (nbx, nby) spatial bin grid;
    candidates come from each floe's 3x3 bin neighborhood (wrapping through
    periodic boundaries).  Requires bin size >= 2*max(rmax), which the
    Simulation builder guarantees when choosing (nbx, nby)."""
    nbx, nby, M = bins
    N = floes.capacity
    dtype = floes.verts.dtype
    c = floes.centroid
    r = floes.rmax
    act = floes.active
    w_val = domain.vals[WEST]
    s_val = domain.vals[SOUTH]
    Lx = domain.vals[EAST] - w_val
    Ly = domain.vals[NORTH] - s_val
    bx = Lx / nbx
    by = Ly / nby

    ibx = jnp.clip(jnp.floor((c[:, 0] - w_val) / bx).astype(jnp.int32), 0, nbx - 1)
    iby = jnp.clip(jnp.floor((c[:, 1] - s_val) / by).astype(jnp.int32), 0, nby - 1)
    NB = nbx * nby
    bin_id = jnp.where(act, ibx * nby + iby, NB)
    # Per-bin member lists by sorting floes on bin id, then GATHERING each
    # bin's contiguous run into its [M] row (start offsets from a bincount
    # prefix sum).  O(N log N + NB * M) - the previous top_k over an
    # [NB, N] membership matrix was quadratic in the pool size and
    # dominated the 16k-floe step (27 ms of 39; tools/probe_phases note in
    # BENCH detail).  This is argsort + gather; the formulation that once
    # faulted the TPU runtime under lax.scan was argsort + SCATTER.
    order = jnp.argsort(bin_id)                      # inactive sort last
    counts = jax.ops.segment_sum(
        jnp.ones((N,), jnp.int32), bin_id, num_segments=NB + 1
    )[:NB]
    start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    kk = jnp.arange(M, dtype=jnp.int32)
    flat = start[:, None] + kk[None, :]              # [NB, M]
    mem_valid = kk[None, :] < counts[:, None]
    mem_sel = jnp.where(
        mem_valid, order[jnp.minimum(flat, N - 1)], N
    )
    bin_overflow = jnp.any(counts > M)

    # Neighbor bins: a forward HALF-SHELL (self + E, NE, N, NW) instead of
    # the full 3x3 - every floe-floe pair is enumerated by exactly one
    # side, so candidate columns drop from 9M to 5M (broad phase was 7.9 ms
    # of the 17.4 ms collision cost at N=16k; tools/probe_broad16k.py).
    # Ownership: same-bin pairs keep the (i+j)-parity rule; cross-bin pairs
    # belong to the floe whose bin sees the other in its forward set (the
    # forward and backward offset sets partition the 8 neighbors, so this
    # is exact).  Degenerate grids where periodic mod-wrap would collide a
    # forward offset with a backward one (nbx or nby < 3) fall back to the
    # full 3x3 + parity everywhere.
    half_shell = (nbx >= 3 or not domain.ew_periodic) and (
        nby >= 3 or not domain.ns_periodic
    )
    if half_shell:
        d_off = ((0, 0), (1, 0), (1, 1), (0, 1), (-1, 1))
        own_all = (False, True, True, True, True)
    else:
        d_off = ((0, 0), (1, 0), (1, 1), (0, 1), (-1, 1),
                 (-1, 0), (-1, -1), (0, -1), (1, -1))
        own_all = (False,) * 9
    NK = len(d_off)
    dxs = jnp.asarray([o[0] for o in d_off])
    dys = jnp.asarray([o[1] for o in d_off])
    nx_idx = ibx[:, None] + dxs[None, :]             # [N, NK]
    ny_idx = iby[:, None] + dys[None, :]
    if domain.ew_periodic:
        nx_ok = jnp.ones_like(nx_idx, bool)
        nx_idx = jnp.mod(nx_idx, nbx)
    else:
        nx_ok = (nx_idx >= 0) & (nx_idx < nbx)
        nx_idx = jnp.clip(nx_idx, 0, nbx - 1)
    if domain.ns_periodic:
        ny_ok = jnp.ones_like(ny_idx, bool)
        ny_idx = jnp.mod(ny_idx, nby)
    else:
        ny_ok = (ny_idx >= 0) & (ny_idx < nby)
        ny_idx = jnp.clip(ny_idx, 0, nby - 1)
    nb_id = nx_idx * nby + ny_idx                    # [N, NK]
    nb_ok = nx_ok & ny_ok

    # Candidate data comes from small per-bin tables gathered as whole
    # M-rows ([N, NK] row-block gathers), NOT per-element gathers through
    # j_cand ([N, NK, M] random gathers serialize on TPU and dominated the
    # binned step).  Each table is a flat [NB, M] array so the gather
    # output tiles cleanly - the old [NB, M, 2] centroid table's minor dim
    # of 2 padded to a full 128-lane tile and its gather alone cost as
    # much as the other three combined (probe_broad16k).  The j table's
    # sentinel N doubles as the empty-slot mask (slot_ok).
    mem_safe = jnp.minimum(mem_sel, N - 1)
    jt = jnp.where(mem_valid, mem_sel, N).astype(jnp.int32)    # [NB, M]
    cx_t = c[mem_safe, 0]
    cy_t = c[mem_safe, 1]
    rm_t = jnp.where(mem_valid, r[mem_safe], 0.0)
    jg = jt[nb_id]                                   # [N,NK,M] (row gather)
    slot_ok = jg < N
    j_cand = jnp.minimum(jg, N - 1)
    cx_cand = cx_t[nb_id]                            # [N,NK,M] (row gather)
    cy_cand = cy_t[nb_id]
    r_cand = rm_t[nb_id]
    iidx = jnp.arange(N)[:, None, None]

    # min-image fold + circle test (identical physics to the dense path)
    dx = c[:, 0][:, None, None] - cx_cand
    dy = c[:, 1][:, None, None] - cy_cand
    sx = jnp.zeros_like(dx)
    sy = jnp.zeros_like(dy)
    if domain.ew_periodic:
        fold = jnp.abs(dx) > Lx / 2
        sx = jnp.where(fold, jnp.sign(dx) * Lx, 0.0)
        dx = dx - sx
    if domain.ns_periodic:
        fold = jnp.abs(dy) > Ly / 2
        sy = jnp.where(fold, jnp.sign(dy) * Ly, 0.0)
        dy = dy - sy
    rsum = r[:, None, None] + r_cand
    own = jnp.asarray(own_all)[None, :, None] | (
        (((iidx + j_cand) % 2) == 0) == (iidx < j_cand)
    )
    mask = (
        nb_ok[:, :, None]
        & slot_ok
        & act[:, None, None]
        # members are active by construction (inactive bin_id -> NB)
        & own
        & (iidx != j_cand)
        & (dx * dx + dy * dy < rsum * rsum)
    )

    # 3x3 neighborhoods only capture pairs within one bin length: flag if
    # floes have grown (fuse/weld) beyond the bin-size guarantee
    rmax_ok = 2.0 * jnp.max(jnp.where(act, r, 0.0)) <= jnp.minimum(bx, by)
    bin_overflow = bin_overflow | ~rmax_ok

    fw, ft = _wall_topo_masks(floes, domain)
    T = domain.topography.count

    # unified candidate matrix: [N, NK*M | 4 walls | T topo]
    CFF = NK * M
    C2 = CFF + 4 + T
    full_mask = jnp.concatenate([mask.reshape(N, CFF), fw, ft], axis=1)
    row_cap = max(min(pair_cap // max(N, 1), C2), 8)
    E = _extra_cap(N)
    sel, valid, sel_overflow, epos = _rank_select_rows(
        full_mask, row_cap, extra_cap=E
    )
    overflow = bin_overflow | sel_overflow

    is_ff = sel < CFF
    selg = jnp.minimum(sel, CFF + 3 + T)
    # ff columns map through j_cand; wall/topo columns map to pool slots
    jc = j_cand.reshape(N, CFF)
    j_ff = jnp.take_along_axis(jc, jnp.minimum(selg, CFF - 1), axis=1)
    j_other = N + jnp.maximum(selg - CFF, 0)
    qj = jnp.where(is_ff, j_ff, j_other).reshape(-1).astype(jnp.int32)
    qi = (
        jnp.broadcast_to(jnp.arange(N)[:, None], (N, row_cap))
        .reshape(-1)
        .astype(jnp.int32)
    )
    sxf = sx.reshape(N, CFF)
    syf = sy.reshape(N, CFF)
    sxg = jnp.take_along_axis(sxf, jnp.minimum(selg, CFF - 1), axis=1)
    syg = jnp.take_along_axis(syf, jnp.minimum(selg, CFF - 1), axis=1)
    shift = jnp.where(
        is_ff.reshape(-1)[:, None],
        jnp.stack([sxg.reshape(-1), syg.reshape(-1)], axis=-1),
        0.0,
    )

    # second-chance block: flat positions into [N, C2]
    evalid = epos < N * C2
    eps_ = jnp.minimum(epos, N * C2 - 1)
    ei = jnp.where(evalid, eps_ // C2, N - 1).astype(jnp.int32)
    ecol = jnp.where(evalid, eps_ % C2, 0).astype(jnp.int32)
    e_is_ff = ecol < CFF
    eflat = ei * CFF + jnp.minimum(ecol, CFF - 1)
    ej_ff = j_cand.reshape(-1)[eflat]
    ej = jnp.where(
        e_is_ff, ej_ff, jnp.minimum(N + jnp.maximum(ecol - CFF, 0), N + 3 + T)
    ).astype(jnp.int32)
    ej = jnp.where(evalid, ej, N - 1)
    esx = sx.reshape(-1)[eflat]
    esy = sy.reshape(-1)[eflat]
    eshift = jnp.where(
        (e_is_ff & evalid)[:, None], jnp.stack([esx, esy], axis=-1), 0.0
    )
    return PairArrays(
        qi=jnp.concatenate([qi, ei]),
        qj=jnp.concatenate([qj, ej]),
        shift=jnp.concatenate([shift, eshift], axis=0),
        valid=jnp.concatenate([valid.reshape(-1), evalid]),
        overflow=overflow,
    )


def pair_overlaps(
    floes: FloeState,
    domain: Domain,
    pair_cap: int,
    clip_cap: int = DEFAULT_CAP,
    bins: tuple | None = None,
):
    """Overlap areas of all currently intersecting pairs, for the host-side
    ridge/raft pass (the analog of walking the reference's per-floe
    interaction lists, ridge_raft.jl:704-753).

    Returns (i, j, area, valid, overflow): j >= 0 is a floe pool index;
    j < 0 encodes walls (-1..-4 for N,S,E,W) and topography (-5 - t),
    matching the reference's interaction indexing (domains.jl:150-163).
    ``overflow`` (scalar bool) fires when the broad phase or the slow-path
    multi-region capacity truncated candidates, i.e. the overlap list may
    be incomplete (mirrors timestep_collisions' overflow reporting).
    """
    N = floes.capacity
    dtype = floes.verts.dtype
    pairs = find_candidate_pairs(floes, domain, pair_cap, bins)
    T = domain.topography.count
    V = floes.max_verts

    wall_vs = []
    wall_ns = []
    for w in range(4):
        wv, wn = wall_rect(domain, w, V, dtype)
        wall_vs.append(wv)
        wall_ns.append(wn)
    q_verts = jnp.concatenate(
        [floes.verts, jnp.stack(wall_vs), domain.topography.verts.astype(dtype)],
        axis=0,
    )
    q_n = jnp.concatenate(
        [floes.nverts, jnp.stack(wall_ns), domain.topography.nverts], axis=0
    )
    i0 = pairs.qi
    j0 = pairs.qj
    eps_rel = 1e-9 if dtype == jnp.float64 else 2e-6
    q_is_floe = j0 < N
    scale0 = floes.rmax[i0] + jnp.where(
        q_is_floe, floes.rmax[jnp.minimum(j0, N - 1)], floes.rmax[i0]
    )
    perturb0 = eps_rel * scale0
    tc = two_cross_dispatch(
        floes.verts[i0],
        floes.nverts[i0],
        q_verts[j0] + pairs.shift[:, None, :],
        q_n[j0],
        perturb0,
    )
    # multi-region / degenerate pairs through the general kernel
    PC = pairs.qi.shape[0]
    slow_cap = max(pair_cap // 128, 32)
    slow_mask = pairs.valid & (tc.cnt > 0) & ~tc.ok
    n_slow = jnp.sum(slow_mask.astype(jnp.int32))
    (ssel,) = jnp.nonzero(slow_mask, size=slow_cap, fill_value=PC)
    svalid = ssel < PC
    ssafe = jnp.minimum(ssel, PC - 1)
    regions = jax.vmap(
        lambda a, b, c, d, p: intersect_regions(a, b, c, d, CAP=clip_cap, perturb=p)
    )(
        floes.verts[i0[ssafe]],
        floes.nverts[i0[ssafe]],
        q_verts[j0[ssafe]] + pairs.shift[ssafe][:, None, :],
        q_n[j0[ssafe]],
        perturb0[ssafe],
    )
    slow_total = jnp.where(svalid, regions.total_area, 0.0)
    area = (
        tc.contain
        + jnp.where(tc.ok, tc.area, 0.0)
        + _onehot_sum(slow_total[:, None], ssel, PC)[:, 0]
    )
    valid = pairs.valid & (area > 0)
    # encode j: floes stay as pool index; walls -> -1..-4; topo -> -5-t
    j_enc = jnp.where(
        j0 < N, j0, jnp.where(j0 < N + 4, -(j0 - N) - 1, -(j0 - N - 4) - 5)
    )
    overflow = (
        pairs.overflow
        | (n_slow > slow_cap)
        | jnp.any(jnp.where(svalid, regions.overflow, False))
    )
    return i0, j_enc, area, valid, overflow


def pair_interactions(
    floes: FloeState,
    domain: Domain,
    consts: Constants,
    dt: float,
    pair_cap: int,
    clip_cap: int = DEFAULT_CAP,
    bins: tuple | None = None,
):
    """Materialized per-contact interaction rows, for output/diagnostics.

    The reference stores growable n x 7 ``interactions`` matrices on every
    floe (floe.jl:102-118, written by FloeOutputWriter, output.jl:558-572);
    the TPU hot path only keeps aggregates, so this function recomputes the
    per-contact quantities on demand (writer cadence, not per step).

    Returns a dict of arrays over a fixed contact capacity:
      i [K]        P-side floe pool index
      j [K]        partner: >= 0 floe pool index, -1..-4 walls, <= -5 topo
      fx, fy [K]   contact force on floe i (add_interactions! columns 2-3)
      px, py [K]   force application point (columns 4-5)
      torque [K]   torque about i's centroid (calc_torque!, column 6)
      overlap [K]  region overlap area (column 7)
      valid [K]    row validity mask
      overflow []  capacity-truncation flag
    Rows are two-sided for floe-floe contacts, exactly like the reference's
    bookkeeping (add_interactions! on both floes + the reaction pass,
    collisions.jl:285-309, 799-828): each unordered pair emits the owner's
    row AND the partner's mirror row (negated force, force point shifted to
    the partner's periodic frame, torque about the partner's centroid), so
    per-floe ``num_inters`` counts match output.jl:558-572.  Wall/topography
    contacts emit one row (the domain keeps no interaction list).
    """
    N = floes.capacity
    V = floes.max_verts
    dtype = floes.verts.dtype
    vals = domain.vals
    pairs = find_candidate_pairs(floes, domain, pair_cap, bins)
    PC = pairs.qi.shape[0]

    wall_vs, wall_ns = [], []
    for w in range(4):
        wv, wn = wall_rect(domain, w, V, dtype)
        wall_vs.append(wv)
        wall_ns.append(wn)
    q_verts = jnp.concatenate(
        [floes.verts, jnp.stack(wall_vs), domain.topography.verts.astype(dtype)],
        axis=0,
    )
    q_n = jnp.concatenate(
        [floes.nverts, jnp.stack(wall_ns), domain.topography.nverts], axis=0
    )
    wall_cent = jnp.zeros((4, 2), dtype)
    q_cent = jnp.concatenate(
        [floes.centroid, wall_cent, domain.topography.centroid.astype(dtype)],
        axis=0,
    )
    q_table = _q_table(floes, domain, q_n, q_cent, dtype)

    i0, j0, pvalid0 = pairs.qi, pairs.qj, pairs.valid
    # writer-cadence path: plain gathers, no row-layout assumptions (the
    # candidate list is hybrid: row block + second-chance entries)
    sides0 = _gather_sides(floes, q_table, i0, j0)
    eps_rel = 1e-9 if dtype == jnp.float64 else 2e-6
    perturb0 = eps_rel * (
        sides0.rmax_i + jnp.where(sides0.is_floe_j, sides0.rmax_j, sides0.rmax_i)
    )
    tc = two_cross_dispatch(
        floes.verts[i0], floes.nverts[i0],
        q_verts[j0] + pairs.shift[:, None, :], q_n[j0], perturb0,
    )
    fast_ok = pvalid0 & tc.ok
    R1 = 1
    fast_regions = ClipRegions(
        total_area=tc.area,
        area=tc.area[:, None],
        centroid=tc.centroid[:, None, :],
        n_cross=jnp.full((PC, R1), 2, jnp.int32),
        chord_a=tc.chord_a[:, None, :],
        chord_b=tc.chord_b[:, None, :],
        p_norm=tc.p_norm[:, None, :],
        p_len=jnp.zeros((PC, R1), dtype),
        p_cnt=jnp.zeros((PC, R1), jnp.int32),
        q_cnt=jnp.zeros((PC, R1), jnp.int32),
        valid=(fast_ok & (tc.area > 0))[:, None],
        overflow=jnp.asarray(False),
    )
    f_force, f_fp, f_rec = _region_forces(
        consts, dt, vals, sides0, pairs.shift, fast_regions, fast_ok,
    )

    # slow path (multi-region contacts)
    slow_cap = max(pair_cap // 128, 32)
    slow_mask = pvalid0 & (tc.cnt > 0) & ~tc.ok
    n_slow = jnp.sum(slow_mask.astype(jnp.int32))
    (ssel,) = jnp.nonzero(slow_mask, size=slow_cap, fill_value=PC)
    svalid = ssel < PC
    ssafe = jnp.minimum(ssel, PC - 1)
    i1, j1 = i0[ssafe], j0[ssafe]
    shift1 = pairs.shift[ssafe]
    sregions = jax.vmap(
        lambda a, b, c, d, p: intersect_regions(a, b, c, d, CAP=clip_cap, perturb=p)
    )(
        floes.verts[i1], floes.nverts[i1],
        q_verts[j1] + shift1[:, None, :], q_n[j1], perturb0[ssafe],
    )
    sides1 = _gather_sides(floes, q_table, i1, j1)
    s_force, s_fp, s_rec = _region_forces(
        consts, dt, vals, sides1, shift1, sregions,
        svalid & (sregions.total_area > 0),
    )

    def enc(j):
        return jnp.where(
            j < N, j, jnp.where(j < N + 4, -(j - N) - 1, -(j - N - 4) - 5)
        )

    def rows(i, j, s, force, fp, rec, base_valid, shift):
        R = force.shape[1]
        ri_ = fp - s.cent_i[:, None, :]
        trq = ri_[..., 0] * force[..., 1] - ri_[..., 1] * force[..., 0]
        nonzero = jnp.sum(jnp.abs(force), axis=-1) > 0
        out_valid = base_valid[:, None] & nonzero
        tile = lambda x: jnp.broadcast_to(
            x[:, None], (x.shape[0], R)
        ).reshape(-1)
        # partner-side mirror rows (floe-floe only): force point moved to
        # the partner's unshifted periodic frame, torque about its centroid
        fp_j = fp - shift[:, None, :]
        rj_ = fp_j - s.cent_j[:, None, :]
        trq_j = rj_[..., 0] * (-force[..., 1]) - rj_[..., 1] * (-force[..., 0])
        m_valid = out_valid & s.is_floe_j[:, None]
        cat = jnp.concatenate
        return {
            "i": cat([tile(i), tile(j)]),
            "j": cat([tile(enc(j)), tile(i)]),
            "fx": cat([force[..., 0].reshape(-1), -force[..., 0].reshape(-1)]),
            "fy": cat([force[..., 1].reshape(-1), -force[..., 1].reshape(-1)]),
            "px": cat([fp[..., 0].reshape(-1), fp_j[..., 0].reshape(-1)]),
            "py": cat([fp[..., 1].reshape(-1), fp_j[..., 1].reshape(-1)]),
            "torque": cat([trq.reshape(-1), trq_j.reshape(-1)]),
            "overlap": cat([rec.reshape(-1), rec.reshape(-1)]),
            "valid": cat([out_valid.reshape(-1), m_valid.reshape(-1)]),
        }

    rf = rows(i0, j0, sides0, f_force, f_fp, f_rec, fast_ok, pairs.shift)
    rs = rows(i1, j1, sides1, s_force, s_fp, s_rec, svalid, shift1)
    out = {k: jnp.concatenate([rf[k], rs[k]]) for k in rf}
    out["overflow"] = (
        pairs.overflow
        | (n_slow > slow_cap)
        | jnp.any(jnp.where(svalid, sregions.overflow, False))
    )
    return out


class _PairSides(NamedTuple):
    """Per-pair gathered quantities for one contact list (all [K] or [K,2]).

    Built by _gather_sides: the i side of the broad-phase list is
    row-structured so its values are broadcasts (no gathers); the j side is
    ONE packed-table gather.  Dozens of small independent gathers compiled
    to latency-bound TPU kernels (~0.8 ms at K~4k before this layout)."""

    area_i: jnp.ndarray
    h_i: jnp.ndarray
    nv_i: jnp.ndarray
    cent_i: jnp.ndarray   # [K, 2]
    u_i: jnp.ndarray
    v_i: jnp.ndarray
    xi_i: jnp.ndarray
    rmax_i: jnp.ndarray
    n_j: jnp.ndarray
    u_j: jnp.ndarray
    v_j: jnp.ndarray
    xi_j: jnp.ndarray
    cent_j: jnp.ndarray   # [K, 2]
    h_j: jnp.ndarray
    area_j: jnp.ndarray
    rmax_j: jnp.ndarray
    is_floe_j: jnp.ndarray
    wall_id_j: jnp.ndarray


def _q_table(floes: FloeState, domain: Domain, q_n, q_cent, dtype):
    """Pack the per-Q-slot scalars the force recipe needs into one
    [NQ, 9] table so the j side of a contact list is a single gather."""
    N = floes.capacity
    T = domain.topography.count
    zeros_t = jnp.zeros((T,), dtype)
    q_u = jnp.concatenate([floes.u, domain.velocities[:, 0].astype(dtype), zeros_t])
    q_v = jnp.concatenate([floes.v, domain.velocities[:, 1].astype(dtype), zeros_t])
    q_xi = jnp.concatenate([floes.xi, jnp.zeros((4,), dtype), zeros_t])
    q_height = jnp.concatenate([floes.height, jnp.ones((4 + T,), dtype)])
    q_area = jnp.concatenate([floes.area, jnp.ones((4 + T,), dtype)])
    q_rmax = jnp.concatenate([floes.rmax, jnp.ones((4 + T,), dtype)])
    return jnp.stack(
        [
            q_n.astype(dtype), q_u, q_v, q_xi,
            q_cent[:, 0], q_cent[:, 1], q_height, q_area, q_rmax,
        ],
        axis=1,
    )  # [NQ, 9]


def _gather_sides(
    floes: FloeState,
    q_table: jnp.ndarray,
    i: jnp.ndarray,
    j: jnp.ndarray,
    row_cap: int | None = None,
    n_rows: int | None = None,
    g: jnp.ndarray | None = None,
) -> _PairSides:
    """``g``: optionally the pre-gathered ``q_table[j]`` rows - the hot
    path packs the Q rings and the Q scalar table into ONE [NQ, 2V+9]
    array so the j side costs a single row gather (TPU row gathers are
    issue-rate bound: two separate gathers measured 2.9 ms vs 0.8 ms
    packed at PC = 136k, tools/probe_narrow16k.py)."""
    N = floes.capacity
    NR = N if n_rows is None else n_rows

    if row_cap is not None:
        # hybrid layout: the first NR*row_cap entries are row-structured
        # (i == k // row_cap -> broadcast, no gather); any remaining
        # second-chance entries carry arbitrary i and are gathered
        R = NR * row_cap
        E = i.shape[0] - R

        def bi(x):
            b = jnp.broadcast_to(
                x[:NR, None], (NR, row_cap) + x.shape[1:]
            ).reshape((R,) + x.shape[1:])
            if E == 0:
                return b
            return jnp.concatenate([b, x[i[R:]]], axis=0)
    else:
        def bi(x):
            return x[i]

    if g is None:
        g = q_table[j]  # [K, 9] - the only j-side gather
    return _PairSides(
        area_i=bi(floes.area),
        h_i=bi(floes.height),
        nv_i=bi(floes.nverts),
        cent_i=bi(floes.centroid),
        u_i=bi(floes.u),
        v_i=bi(floes.v),
        xi_i=bi(floes.xi),
        rmax_i=bi(floes.rmax),
        n_j=g[:, 0],
        u_j=g[:, 1],
        v_j=g[:, 2],
        xi_j=g[:, 3],
        cent_j=g[:, 4:6],
        h_j=g[:, 6],
        area_j=g[:, 7],
        rmax_j=g[:, 8],
        is_floe_j=j < N,
        wall_id_j=j - N,
    )


def _region_forces(
    consts: Constants,
    dt: float,
    vals: jnp.ndarray,
    s: _PairSides,
    shift: jnp.ndarray,      # [K, 2] periodic image shift applied to Q
    regions: ClipRegions,    # fields [K, R]
    pair_on: jnp.ndarray,    # [K] pair eligible for contact force
):
    """Hopkins elastic + Coulomb friction forces for one contact list.

    The per-region force recipe of calc_elastic_forces / calc_normal_force /
    calc_friction_forces (collisions.jl:30-283) plus the wall
    normal-direction correction (boundaries.jl:37-148).
    Returns (force [K,R,2], fp [K,R,2], overlap_rec [K,R]).
    """
    dtype = regions.area.dtype

    # ------- force factor (collisions.jl:371-379, 528) ---------------------
    # empty pool slots have h = r = 0; keep the 0/0s out (a NaN here used to
    # be dropped by scatter index masking, but one-hot contractions multiply
    # by zero instead of dropping, and 0 * NaN = NaN poisons whole columns)
    hi = s.h_i
    ri = jnp.sqrt(s.area_i)
    hj = s.h_j
    rj = jnp.sqrt(jnp.where(s.is_floe_j, s.area_j, 1.0))
    den_big = jnp.minimum(ri, rj)
    ff_big = consts.E * jnp.minimum(hi, hj) / jnp.where(den_big > 0, den_big, 1.0)
    den_std = hi * rj + hj * ri
    ff_std = consts.E * (hi * hj) / jnp.where(den_std > 0, den_std, 1.0)
    ff_floe = jnp.where((ri > 1e5) | (rj > 1e5), ff_big, ff_std)
    ff_dom = consts.E * hi / jnp.where(ri > 0, ri, 1.0)
    force_factor = jnp.where(s.is_floe_j, ff_floe, ff_dom)

    # ------- per-region elastic normal forces ------------------------------
    # region min-area filter (calc_elastic_forces, collisions.jl:158-169)
    min_area = (
        jnp.minimum(s.nv_i.astype(dtype), s.n_j) * 100.0 / 1.75
    )
    reg_ok = regions.valid & (regions.area >= min_area[:, None]) & pair_on[:, None]

    chord = regions.chord_b - regions.chord_a
    chord_len = jnp.linalg.norm(chord, axis=-1)
    two_pts = regions.n_cross == 2
    # 2-crossing case: direction perpendicular to the chord, sign chosen to
    # reduce the overlap = aligned with the P-chain inward-normal sum
    perp = jnp.stack([-chord[..., 1], chord[..., 0]], axis=-1)
    sgn = jnp.sign(jnp.sum(perp * regions.p_norm, axis=-1))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    dir2 = perp * sgn[..., None] / jnp.maximum(chord_len, 1e-30)[..., None]
    dl2 = chord_len
    # many-crossing case (_many_intersect_normal_force!, collisions.jl:78-119)
    pn_norm = jnp.linalg.norm(regions.p_norm, axis=-1)
    dirM = regions.p_norm / jnp.maximum(pn_norm, 1e-30)[..., None]
    p_cnt = regions.p_cnt
    dlM = regions.p_len / jnp.maximum(p_cnt, 1).astype(dtype)
    # reference condition 0 < n_pts < npoints(region)-1: require a Q chain too
    manyok = (p_cnt > 0) & (regions.q_cnt > 0)

    dl = jnp.where(two_pts, dl2, jnp.where(manyok, dlM, 0.0))
    fdir = jnp.where(
        two_pts[..., None], dir2, jnp.where(manyok[..., None], dirM, 0.0)
    )
    # overlap-too-small gate (collisions.jl:51, 112)
    force_on = reg_ok & (dl > 0.1)
    normal_force = (
        fdir * (regions.area * force_factor[:, None])[..., None]
    ) * force_on[..., None]

    # ------- wall normal-direction correction (boundaries.jl:37-148) -------
    fp = regions.centroid  # [K, R, 2] force application points
    is_wall = (s.wall_id_j >= 0) & (s.wall_id_j < 4)
    wid = jnp.clip(s.wall_id_j, 0, 3)
    wall_val = vals[wid]
    # N: fp.y >= val -> zero x force; S: fp.y <= val -> zero x
    # E: fp.x >= val -> zero y;       W: fp.x <= val -> zero y
    zx = (
        ((wid == NORTH)[:, None] & (fp[..., 1] >= wall_val[:, None]))
        | ((wid == SOUTH)[:, None] & (fp[..., 1] <= wall_val[:, None]))
    )
    zy = (
        ((wid == EAST)[:, None] & (fp[..., 0] >= wall_val[:, None]))
        | ((wid == WEST)[:, None] & (fp[..., 0] <= wall_val[:, None]))
    )
    nx = jnp.where(is_wall[:, None] & zx, 0.0, normal_force[..., 0])
    ny = jnp.where(is_wall[:, None] & zy, 0.0, normal_force[..., 1])
    normal_force = jnp.stack([nx, ny], axis=-1)

    # ------- friction (calc_friction_forces, collisions.jl:243-283) --------
    G = consts.E / (2.0 * (1.0 + consts.nu))
    nnorm = jnp.linalg.norm(normal_force, axis=-1)
    ci = s.cent_i
    ui = s.u_i[:, None] + s.xi_i[:, None] * -(fp[..., 1] - ci[:, None, 1])
    vi_ = s.v_i[:, None] + s.xi_i[:, None] * (fp[..., 0] - ci[:, None, 0])
    cjs = s.cent_j + shift  # shifted centroid of Q
    ujp = s.u_j[:, None] + s.xi_j[:, None] * -(fp[..., 1] - cjs[:, None, 1])
    vjp = s.v_j[:, None] + s.xi_j[:, None] * (fp[..., 0] - cjs[:, None, 0])
    udiff = ui - ujp
    vdiff = vi_ - vjp
    vnorm = jnp.sqrt(udiff**2 + vdiff**2)
    vn_safe = jnp.where(vnorm > 0, vnorm, 1.0)
    xdir = jnp.where(vnorm > 0, udiff / vn_safe, 0.0)
    ydir = jnp.where(vnorm > 0, vdiff / vn_safe, 0.0)
    dot_dir = xdir * udiff + ydir * vdiff
    xfric = G * dl * dt * nnorm * xdir * -dot_dir
    yfric = G * dl * dt * nnorm * ydir * -dot_dir
    fric_norm = jnp.sqrt(xfric**2 + yfric**2)
    over = fric_norm > consts.mu * nnorm
    xfric = jnp.where(over, -consts.mu * nnorm * xdir, xfric)
    yfric = jnp.where(over, -consts.mu * nnorm * ydir, yfric)
    friction = jnp.stack([xfric, yfric], axis=-1) * force_on[..., None]

    force = normal_force + friction  # [K, R, 2]
    # interactions are only recorded when force != 0 (add_interactions!,
    # collisions.jl:288)
    nonzero = force_on & (jnp.sum(jnp.abs(force), axis=-1) > 0)
    overlap_rec = jnp.where(nonzero, regions.area, 0.0)
    return force, fp, overlap_rec


def _onehot_sum(payload: jnp.ndarray, idx: jnp.ndarray, N: int) -> jnp.ndarray:
    """Scatter-add ``payload [K, F]`` into ``out [N, F]`` at rows ``idx [K]``.

    Small pools: a [K, N] one-hot MXU contraction (TPU scatters serialize;
    each segment_sum was ~0.1 ms at K~4k, and at that scale the one-hot is
    a few MB).  Large pools: the one-hot grows as K x N (~4 GB of HBM
    traffic at K=123k, N=8k), so segment_sum's serialized scatter-adds
    (K x F elements) win.  Rows with idx outside [0, N) are dropped."""
    dtype = payload.dtype
    K = idx.shape[0]
    if K * N > 1 << 25:  # ~128 MB of one-hot in f32
        idx_safe = jnp.where((idx >= 0) & (idx < N), idx, N)
        return jax.ops.segment_sum(payload, idx_safe, num_segments=N + 1)[:N]
    onehot = (idx[:, None] == jnp.arange(N, dtype=idx.dtype)[None, :]).astype(dtype)
    return jax.lax.dot_general(
        onehot, payload, (((0,), (0,)), ((), ())),
        preferred_element_type=dtype,
    )  # [N, F]


def _accumulate_contacts(
    N: int,
    i: jnp.ndarray,          # [K]
    j: jnp.ndarray,          # [K]
    s: _PairSides,
    pair_valid: jnp.ndarray,  # [K]
    is_ff: jnp.ndarray,      # [K] reaction lands on floe j
    shift: jnp.ndarray,      # [K, 2]
    force: jnp.ndarray,      # [K, R, 2]
    fp: jnp.ndarray,         # [K, R, 2]
    overlap_rec: jnp.ndarray,  # [K, R]
    row_cap: int | None = None,
    n_rows: int | None = None,
):
    """Symmetric +F/-F accumulation of one contact list onto the floe pool
    (replaces the reference's serial reaction pass, collisions.jl:799-862).

    Scatter-free: the i side of the broad-phase candidate list is
    row-structured (i == k // row_cap), so its sums are plain reshape
    reductions when ``row_cap`` is given; the data-dependent j side goes
    through one one-hot matmul.  Returns (col_force, col_trq,
    stress_moments, overarea) per floe.
    """
    dtype = force.dtype
    K = i.shape[0]

    fsum = jnp.sum(force, axis=1)  # [K, 2]

    # torques about each side's centroid (calc_torque!, collisions.jl:673-686)
    ci = s.cent_i
    ri_ = fp - ci[:, None, :]
    trq_i = jnp.sum(ri_[..., 0] * force[..., 1] - ri_[..., 1] * force[..., 0], axis=1)
    fp_j = fp - shift[:, None, :]  # force point in j's unshifted frame
    cj0 = s.cent_j
    rj_ = fp_j - cj0[:, None, :]
    trq_j = jnp.sum(
        rj_[..., 0] * (-force[..., 1]) - rj_[..., 1] * (-force[..., 0]), axis=1
    )

    # stress moments (calc_stress!, update_floe.jl:392-414):
    # s11 += rx*Fx, s12 += 0.5*(ry*Fx + rx*Fy), s22 += ry*Fy
    def stress_moments(rvec, f):
        s11 = jnp.sum(rvec[..., 0] * f[..., 0], axis=1)
        s12 = 0.5 * jnp.sum(
            rvec[..., 1] * f[..., 0] + rvec[..., 0] * f[..., 1], axis=1
        )
        s22 = jnp.sum(rvec[..., 1] * f[..., 1], axis=1)
        return jnp.stack([s11, s12, s22], axis=-1)  # [K, 3]

    smv_i = stress_moments(ri_, force)
    smv_j = stress_moments(rj_, -force)
    ov = jnp.sum(overlap_rec, axis=1)  # [K]

    # payload columns: fx, fy, trq, s11, s12, s22, overarea  (7)
    pay_i = jnp.concatenate(
        [fsum, trq_i[:, None], smv_i, ov[:, None]], axis=1
    )
    pay_i = jnp.where(pair_valid[:, None], pay_i, 0.0)
    # mask BEFORE the contraction: a dropped row must contribute exact zeros,
    # not 0 * (possibly non-finite payload)
    pay_j = jnp.concatenate(
        [-fsum, trq_j[:, None], smv_j, ov[:, None]], axis=1
    )
    pay_j = jnp.where(is_ff[:, None], pay_j, 0.0)

    if row_cap is not None:
        NR = N if n_rows is None else n_rows
        R = NR * row_cap
        acc_i = jnp.sum(pay_i[:R].reshape(NR, row_cap, -1), axis=1)  # [NR, 7]
        if NR < N:
            acc_i = jnp.concatenate(
                [acc_i, jnp.zeros((N - NR, acc_i.shape[1]), acc_i.dtype)]
            )
        if K > R:  # second-chance entries: arbitrary i
            seg_ie = jnp.where(pair_valid[R:], i[R:], N).astype(jnp.int32)
            acc_i = acc_i + _onehot_sum(pay_i[R:], seg_ie, N)
    else:
        seg_i = jnp.where(pair_valid, i, N).astype(jnp.int32)
        acc_i = _onehot_sum(pay_i, seg_i, N)
    jf = jnp.where(is_ff, j, N).astype(jnp.int32)  # only floe reactions
    acc_j = _onehot_sum(pay_j, jf, N)

    acc = acc_i + acc_j
    col_force = acc[:, 0:2]
    col_trq = acc[:, 2]
    s11, s12, s22 = acc[:, 3], acc[:, 4], acc[:, 5]
    sm = jnp.stack(
        [jnp.stack([s11, s12], -1), jnp.stack([s12, s22], -1)], axis=-2
    )
    overarea = acc[:, 6]
    return col_force, col_trq, sm, overarea


class CollisionResult(NamedTuple):
    floes: FloeState
    stress_instant: jnp.ndarray  # [N, 2, 2] this-step stress (calc_stress!)
    overflow: jnp.ndarray        # pair-capacity or crossing-capacity overflow


def timestep_collisions(
    floes: FloeState,
    domain: Domain,
    consts: Constants,
    dt: float,
    collision_settings: CollisionSettings,
    pair_cap: int,
    clip_cap: int = DEFAULT_CAP,
    bins: tuple | None = None,
    owned_rows: int | None = None,
    with_debug: bool = False,
) -> CollisionResult:
    """timestep_collisions! (collisions.jl:734-864), fully batched.

    ``owned_rows``: see find_candidate_pairs - prunes halo-halo and
    halo-wall candidates when the pool is a halo-extended local block.
    ``with_debug``: additionally return a dict of per-capacity counters
    (which component of the overflow flag fired; tools/probe_overflow_source.py)."""
    N = floes.capacity
    V = floes.max_verts
    dtype = floes.verts.dtype
    act = floes.active
    # NR: number of row-structured candidate rows (< N when halo rows of a
    # distributed extended pool are pruned from the broad phase)
    NR = N if owned_rows is None else owned_rows

    pairs = find_candidate_pairs(floes, domain, pair_cap, bins, owned_rows)
    PC = pairs.qi.shape[0]

    # ---------------- open-boundary removal (collisions.jl:427-441) --------
    remove = floes.remove
    vals = domain.vals
    vx = floes.verts[..., 0]
    vy = floes.verts[..., 1]
    vmask = jnp.arange(V)[None, :] < floes.nverts[:, None]
    big = jnp.asarray(1e30, dtype)
    for w, cmp in (
        (NORTH, jnp.max(jnp.where(vmask, vy, -big), axis=1) > vals[NORTH]),
        (SOUTH, jnp.min(jnp.where(vmask, vy, big), axis=1) < vals[SOUTH]),
        (EAST, jnp.max(jnp.where(vmask, vx, -big), axis=1) > vals[EAST]),
        (WEST, jnp.min(jnp.where(vmask, vx, big), axis=1) < vals[WEST]),
    ):
        if domain.kinds[w] == BoundaryKind.OPEN:
            remove = remove | (act & cmp)

    # ---------------- build Q pool -----------------------------------------
    T = domain.topography.count
    wall_vs = []
    wall_ns = []
    for w in range(4):
        wv, wn = wall_rect(domain, w, V, dtype)
        wall_vs.append(wv)
        wall_ns.append(wn)
    q_verts = jnp.concatenate(
        [floes.verts, jnp.stack(wall_vs), domain.topography.verts.astype(dtype)], axis=0
    )
    q_n = jnp.concatenate(
        [floes.nverts, jnp.stack(wall_ns), domain.topography.nverts], axis=0
    )
    wall_cent = jnp.zeros((4, 2), dtype)  # unused (xi = 0 for walls)
    q_cent = jnp.concatenate(
        [floes.centroid, wall_cent, domain.topography.centroid.astype(dtype)], axis=0
    )
    q_table = _q_table(floes, domain, q_n, q_cent, dtype)

    # ---------------- fused narrow phase (fast path) ------------------------
    # One pair-minor elementwise pass over ALL candidate pairs computes the
    # crossing count, containment area, and - for the dominant 2-crossing
    # single-region contacts - the full region quantities directly.  Only
    # multi-region / degenerate contacts (C-shapes etc.) go through the
    # general sort/compact/cycle kernel, at a small capacity.
    #
    # Large pools first COMPACT the candidate list to its valid pairs: the
    # broad-phase row capacity must cover the max per-floe degree (~16)
    # while the mean is ~3-4, and every narrow-phase gather pays per ROW of
    # the padded list (TPU row gathers are issue-rate bound, ~70 ns each -
    # 9 ms of the 17 ms collision cost at N = 8k was gathers on padding).
    # Compaction costs one cumsum-based nonzero over the [PC] mask and
    # drops the row structure (i side switches to gathers + segment sums).
    i0 = pairs.qi
    j0 = pairs.qj
    pvalid0 = pairs.valid
    compact = N >= COMPACT_MIN_N
    compact_overflow = jnp.asarray(False)
    if compact:
        KC = 6 * N  # ~2x the expected valid-pair count at conc 0.8
        compact_overflow = jnp.sum(pvalid0.astype(jnp.int32)) > KC
        (csel,) = jnp.nonzero(pvalid0, size=KC, fill_value=PC)
        cvalid = csel < PC
        csafe = jnp.minimum(csel, PC - 1)
        i0 = jnp.where(cvalid, i0[csafe], N - 1)
        j0 = jnp.where(cvalid, j0[csafe], N - 1)
        pairs = pairs._replace(
            shift=jnp.where(cvalid[:, None], pairs.shift[csafe], 0.0)
        )
        pvalid0 = cvalid
        PC = KC
        row_cap0 = None
    else:
        # hybrid layout from find_candidate_pairs: NR*row_cap row-structured
        # entries followed by _extra_cap(N) second-chance entries
        row_cap0 = (PC - _extra_cap(N)) // NR
    # ONE row gather for everything the j side needs: rings + scalar table
    # packed per Q slot (separate q_verts[j0] / q_table[j0] gathers measured
    # 2.9 ms vs 0.8 ms packed at PC = 136k; tools/probe_narrow16k.py)
    NQ = N + 4 + T
    q_pack = jnp.concatenate([q_verts.reshape(NQ, 2 * V), q_table], axis=1)
    gpk = q_pack[j0]  # [PC, 2V + 9]
    sides0 = _gather_sides(
        floes, q_table, i0, j0, row_cap=row_cap0, n_rows=NR,
        g=gpk[:, 2 * V:],
    )

    # deterministic degeneracy-breaking perturbation, scaled to the pair
    eps_rel = 1e-9 if dtype == jnp.float64 else 2e-6
    scale0 = sides0.rmax_i + jnp.where(
        sides0.is_floe_j, sides0.rmax_j, sides0.rmax_i
    )
    perturb0 = eps_rel * scale0

    # i-side rings are row-structured broadcasts (or gathers on the
    # compacted list); the j side is one row-block gather (contiguous
    # [V, 2] rows DMA well - measured faster than the [PC, NQ] one-hot MXU
    # contraction it replaces, which materializes PC x NQ and grows
    # quadratic-ish with pool size)
    if row_cap0 is not None:
        R0 = NR * row_cap0
        pv0 = jnp.broadcast_to(
            floes.verts[:NR, None], (NR, row_cap0, V, 2)
        ).reshape(R0, V, 2)
        pn0 = jnp.broadcast_to(
            floes.nverts[:NR, None], (NR, row_cap0)
        ).reshape(R0)
        if PC > R0:  # second-chance entries: arbitrary i, gathered
            pv0 = jnp.concatenate([pv0, floes.verts[i0[R0:]]], axis=0)
            pn0 = jnp.concatenate([pn0, floes.nverts[i0[R0:]]], axis=0)
    else:
        pv0 = floes.verts[i0]
        pn0 = floes.nverts[i0]
    qv0 = gpk[:, : 2 * V].reshape(PC, V, 2)
    qn0 = sides0.n_j.astype(jnp.int32)

    tc = two_cross_dispatch(
        pv0,
        pn0,
        qv0 + pairs.shift[:, None, :],
        qn0,
        perturb0,
    )
    cnt0 = jnp.where(pvalid0, tc.cnt, 0)
    contain0 = jnp.where(pvalid0, tc.contain, 0.0)
    fast_ok = pvalid0 & tc.ok

    # ---------------- slow path: general region kernel ---------------------
    slow_cap = max(pair_cap // 128, 32)
    slow_mask = pvalid0 & (cnt0 > 0) & ~tc.ok
    n_slow = jnp.sum(slow_mask.astype(jnp.int32))
    (ssel,) = jnp.nonzero(slow_mask, size=slow_cap, fill_value=PC)
    svalid = ssel < PC
    ssafe = jnp.minimum(ssel, PC - 1)
    i1 = i0[ssafe]
    j1 = j0[ssafe]
    shift1 = pairs.shift[ssafe]

    def run_slow_n(cap, pscale=1.0):
        """General kernel on the first ``cap`` slow rows, zero-padded to
        the full slow_cap output shape (cond branches must agree)."""

        def f():
            regs = jax.vmap(
                lambda a, b, c, d, p: intersect_regions(
                    a, b, c, d, CAP=clip_cap, perturb=p
                )
            )(
                floes.verts[i1[:cap]],
                floes.nverts[i1[:cap]],
                q_verts[j1[:cap]] + shift1[:cap, None, :],
                q_n[j1[:cap]],
                perturb0[ssafe[:cap]] * pscale,
            )
            if cap == slow_cap:
                return regs
            return jax.tree.map(
                lambda a: jnp.concatenate(
                    [a, jnp.zeros((slow_cap - cap,) + a.shape[1:], a.dtype)]
                )
                if a.ndim > 0
                else a,
                regs,
            )

        return f

    def skip_slow():
        return jax.tree.map(
            lambda a: jnp.zeros(a.shape, a.dtype),
            jax.eval_shape(run_slow_n(slow_cap)),
        )

    # most steps have zero multi-region/degenerate contacts: skip the
    # general sort/compact/cycle kernel entirely.  Once contacts evolve,
    # pairs go degenerate at a rate that grows with the pool - a ladder of
    # tiers sizes the kernel to the step's actual demand instead of the
    # slow_cap safety bound (pair_cap // 128 = 1500 rows at N = 16k).
    # Occupancy (tools/probe_slow_occupancy.py, shear-packed conc 0.8):
    # N = 8k: n_slow p50 = 5, p95 = 13; N = 16k: p50 = 92, p95 = 142.
    tiers = sorted({min(t, slow_cap) for t in (8, 16, 64, 256)} | {slow_cap})

    def run_tiered(run):
        def rec(i):
            if i == len(tiers) - 1:
                return run(tiers[i])()
            return jax.lax.cond(
                n_slow <= tiers[i], run(tiers[i]), lambda: rec(i + 1)
            )

        return rec(0)

    sregions = jax.lax.cond(
        n_slow > 0,
        lambda: run_tiered(run_slow_n),
        skip_slow,
    )

    # second-chance perturbation: a contact whose crossing parity comes out
    # ODD is a degeneracy the default perturbation failed to break (shared
    # edges land exactly on vertices in f32) - rerun the slow tier on those
    # steps with the perturbation flipped and scaled, keeping the retry
    # wherever it resolves.  Without this, shear-packed runs truncate
    # forces on ~1% of steps regardless of clip_cap
    # (tools/probe_overflow_source.py: clip_overflow fires, n_slow = 1).
    bad1 = svalid & sregions.overflow
    n_parity_bad = jnp.sum(bad1.astype(jnp.int32))
    # parity-bad rows per step are few (mean ~0.4 at 8k, ~1.8 at 16k):
    # compact just those rows and rerun the general kernel on a tiny fixed
    # batch instead of a whole tier.  Rows beyond RETRY_CAP stay overflowed
    # (the step flag fires), which the occupancy stats put far in the tail.
    RETRY_CAP = min(16, slow_cap)
    (bsel,) = jnp.nonzero(bad1, size=RETRY_CAP, fill_value=slow_cap)
    bvalid = bsel < slow_cap
    bsafe = jnp.minimum(bsel, slow_cap - 1)

    def retry_small(sr):
        regs2 = jax.vmap(
            lambda a, b, c, d, p: intersect_regions(
                a, b, c, d, CAP=clip_cap, perturb=p
            )
        )(
            floes.verts[i1[bsafe]],
            floes.nverts[i1[bsafe]],
            q_verts[j1[bsafe]] + shift1[bsafe][:, None, :],
            q_n[j1[bsafe]],
            # flipped + scaled perturbation breaks the degeneracies the
            # default direction could not
            perturb0[ssafe[bsafe]] * -41.0,
        )
        ok2 = bvalid & ~regs2.overflow
        idx = jnp.where(ok2, bsafe, slow_cap)

        def m(a, b):
            return a.at[idx].set(b, mode="drop")

        return jax.tree.map(m, sr, regs2)

    sregions = jax.lax.cond(
        n_parity_bad > 0, retry_small, lambda sr: sr, sregions
    )
    slow_total = jnp.where(svalid, sregions.total_area, 0.0)

    # slow -> full-list routing (ssel == PC rows drop out); each valid slow
    # row targets a distinct pair, so a sum IS a write - route through
    # _onehot_sum (one-hot matmul at small scale, segment_sum at large)
    def scatter_slow_sum(x):
        return _onehot_sum(x[:, None], ssel, PC)[:, 0]

    scatter_slow_max = scatter_slow_sum

    # total intersection area for every candidate pair (containment included)
    total_area0 = (
        contain0
        + jnp.where(fast_ok, tc.area, 0.0)
        + scatter_slow_sum(slow_total)
    )

    # ------- fuse / remove marking (collisions.jl:364-368, 522-525) --------
    area_i0 = sides0.area_i
    area_j0 = jnp.where(sides0.is_floe_j, sides0.area_j, jnp.inf)
    overlap_frac0 = jnp.maximum(total_area0 / area_i0, total_area0 / area_j0)
    is_ff_pair0 = sides0.is_floe_j & pvalid0
    fuse_pair0 = (
        is_ff_pair0
        & (overlap_frac0 > collision_settings.floe_floe_max_overlap)
        & (total_area0 > 0)
    )
    # domain pairs: remove if max single-region overlap fraction too big
    smax_reg = jnp.max(jnp.where(sregions.valid, sregions.area, 0.0), axis=1)
    max_reg0 = jnp.maximum(
        jnp.where(fast_ok, tc.area, 0.0),
        scatter_slow_max(jnp.where(svalid, smax_reg, 0.0)),
    )
    # containment against a wall counts as a full-floe region
    max_reg0 = jnp.maximum(
        max_reg0, jnp.where(~sides0.is_floe_j, contain0, 0.0)
    )
    dom_remove_pair0 = (
        pvalid0
        & ~sides0.is_floe_j
        & (max_reg0 / area_i0 > collision_settings.floe_domain_max_overlap)
    )

    # ---------------- forces on both contact lists -------------------------
    R1 = 1
    fast_regions = ClipRegions(
        total_area=tc.area,
        area=tc.area[:, None],
        centroid=tc.centroid[:, None, :],
        n_cross=jnp.full((PC, R1), 2, jnp.int32),
        chord_a=tc.chord_a[:, None, :],
        chord_b=tc.chord_b[:, None, :],
        p_norm=tc.p_norm[:, None, :],
        p_len=jnp.zeros((PC, R1), dtype),
        p_cnt=jnp.zeros((PC, R1), jnp.int32),
        q_cnt=jnp.zeros((PC, R1), jnp.int32),
        valid=(fast_ok & (tc.area > 0))[:, None],
        overflow=jnp.asarray(False),
    )
    pair_on0 = fast_ok & ~fuse_pair0 & ~dom_remove_pair0
    pair_on1 = (
        svalid
        & ~fuse_pair0[ssafe]
        & ~dom_remove_pair0[ssafe]
        & (slow_total > 0)
    )
    sides1 = _gather_sides(floes, q_table, i1, j1)
    f_force, f_fp, f_rec = _region_forces(
        consts, dt, vals, sides0, pairs.shift, fast_regions, pair_on0,
    )
    s_force, s_fp, s_rec = _region_forces(
        consts, dt, vals, sides1, shift1, sregions, pair_on1,
    )
    f_acc = _accumulate_contacts(
        N, i0, j0, sides0, pvalid0, is_ff_pair0, pairs.shift,
        f_force, f_fp, f_rec, row_cap=row_cap0, n_rows=NR,
    )
    s_acc = _accumulate_contacts(
        N, i1, j1, sides1, svalid, sides1.is_floe_j & svalid, shift1,
        s_force, s_fp, s_rec,
    )
    col_force = f_acc[0] + s_acc[0]
    col_trq = f_acc[1] + s_acc[1]
    sm = f_acc[2] + s_acc[2]
    overarea = f_acc[3] + s_acc[3]

    ah = floes.area * floes.height
    ah_safe = jnp.where(ah > 0, ah, 1.0)
    stress_instant = sm / ah_safe[:, None, None]

    # fuse / remove marks - over the FULL candidate list so containment
    # pairs (no boundary crossings) are included.  Scatter-free via the
    # row structure of the i side.  Marking is one-sided (the pair's owner
    # records the partner): the host fuse pass (lifecycle_host.fuse_floes)
    # processes a marked pair from either endpoint, so the reference's
    # both-floes-marked bookkeeping (collisions.jl:364-368) is redundant.
    if row_cap0 is not None:
        R0 = NR * row_cap0

        def _pad_rows(a, fill):
            if NR == N:
                return a
            return jnp.concatenate(
                [a, jnp.full((N - NR,) + a.shape[1:], fill, a.dtype)]
            )

        fp_row = fuse_pair0[:R0].reshape(NR, row_cap0)
        fuse_i = _pad_rows(jnp.any(fp_row, axis=1), False)
        fw_i = _pad_rows(
            jnp.max(
                jnp.where(fp_row, j0[:R0].reshape(NR, row_cap0), -1), axis=1
            ),
            -1,
        )
        rem_i = _pad_rows(
            jnp.any(dom_remove_pair0[:R0].reshape(NR, row_cap0), axis=1),
            False,
        )
        if PC > R0:  # second-chance entries via segment_max over their i
            ie = i0[R0:]
            seg_f = jnp.where(fuse_pair0[R0:], ie, N).astype(jnp.int32)
            fw_e = jax.ops.segment_max(
                jnp.where(fuse_pair0[R0:], j0[R0:], -1).astype(jnp.int32),
                seg_f, num_segments=N + 1,
            )[:N]
            fuse_i = fuse_i | (fw_e >= 0)
            fw_i = jnp.maximum(fw_i, fw_e)
            seg_r = jnp.where(dom_remove_pair0[R0:], ie, N).astype(jnp.int32)
            rem_e = jax.ops.segment_max(
                dom_remove_pair0[R0:].astype(jnp.int32), seg_r,
                num_segments=N + 1,
            )[:N]
            rem_i = rem_i | (rem_e > 0)
        fuse_with = jnp.where(fuse_i, fw_i, -1).astype(jnp.int32)
        remove = remove | rem_i
    else:  # compacted list: per-floe maxima via segment_max over i0
        seg_f = jnp.where(fuse_pair0, i0, N).astype(jnp.int32)
        fw_i = jax.ops.segment_max(
            jnp.where(fuse_pair0, j0, -1).astype(jnp.int32), seg_f,
            num_segments=N + 1,
        )[:N]
        fuse_with = jnp.where(fw_i >= 0, fw_i, -1).astype(jnp.int32)
        seg_r = jnp.where(dom_remove_pair0, i0, N).astype(jnp.int32)
        rem_hit = jax.ops.segment_max(
            dom_remove_pair0.astype(jnp.int32), seg_r, num_segments=N + 1
        )[:N]
        remove = remove | (rem_hit > 0)

    new_floes = floes._replace(
        collision_force=jnp.where(act[:, None], col_force, 0.0),
        collision_trq=jnp.where(act, col_trq, 0.0),
        overarea=jnp.where(act, overarea, 0.0),
        remove=remove,
        fuse_with=jnp.where(act, fuse_with, -1),
    )
    overflow = (
        pairs.overflow
        | compact_overflow
        | (n_slow > slow_cap)
        | jnp.any(jnp.where(svalid, sregions.overflow, False))
    )
    result = CollisionResult(
        floes=new_floes,
        stress_instant=jnp.where(act[:, None, None], stress_instant, 0.0),
        overflow=overflow,
    )
    if with_debug:
        dbg = {
            "pairs_overflow": pairs.overflow,
            "n_candidates": jnp.sum(pvalid0.astype(jnp.int32)),
            "compact_overflow": compact_overflow,
            "n_slow": n_slow,
            "slow_cap": jnp.asarray(slow_cap),
            "n_parity_bad": n_parity_bad,  # pre-retry
            "clip_overflow": jnp.any(  # post-retry: what the flag reports
                jnp.where(svalid, sregions.overflow, False)
            ),
        }
        return result, dbg
    return result
