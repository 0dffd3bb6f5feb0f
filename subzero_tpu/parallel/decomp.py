"""Explicit 1-D spatial domain decomposition with ppermute halo exchange.

This is the scalable multi-device/multi-host execution path: the global
domain is split into x-slabs, one per device along a 1-D mesh axis; each
device owns the floes whose centroid lies in its slab.  Per step, inside a
single ``jax.shard_map``:

  1. **Halo exchange** - floes within ``margin`` of a slab edge are packed
     into fixed-size buffers and sent to the adjacent device with
     ``jax.lax.ppermute`` (wrapping through periodic east/west boundaries
     with a coordinate shift, exactly like the reference's ghost floes
     through periodic walls, /root/reference/src/physical_processes/
     collisions.jl:866-1174 - but across *subdomain* edges, which the
     single-process reference never needed).
  2. **Local contact compute** - collisions run on the local pool extended
     with the received halo copies.  Seam pairs are computed on BOTH owning
     devices (2x flops on the seam only), so no reverse force communication
     is needed - the distributed analog of the reference's ghost fold-back
     reduction (collisions.jl:830-862).
  3. **Coupling / integration** - per-floe work is local; two-way-coupling
     grid sums and dissolved-mass deposits are psum-reduced over the mesh
     axis so ocean state stays replicated-consistent.
  4. **Migration** - floes whose centroid crossed a slab edge are packed
     (full state) and ppermuted to the new owner, landing in free pool
     slots.

Communication volume is O(boundary floes), not O(all floes): this is what
gives >= 80% scaling efficiency at many devices, versus the
sharding-propagation path (parallel/mesh.py) whose gathered pair lists
grow with the whole pool.
"""

from __future__ import annotations

import copy
import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.domain import Domain, EAST, WEST
from ..core.floes import FloeState
from ..physics import collisions as _collisions
from ..physics import coupling as _coupling
from ..physics import simplification as _simplification
from ..physics import update_floe as _update_floe

__all__ = [
    "Decomp", "make_decomp", "distribute", "gather", "build_decomp_step",
    "build_decomp_step_halves", "build_decomp_segment",
    "run_decomp", "measure_decomp_scaling",
    "Decomp2D", "make_decomp_2d", "distribute_2d", "build_decomp_step_2d",
]

# fields a halo (collision ghost) copy needs: everything the pair kernel and
# force recipe read from either side of a contact, plus "id" so a fuse mark
# against a halo copy can record the partner's stable identity (see
# _fuse_with_to_ids)
_HALO_FIELDS = (
    "verts", "nverts", "centroid", "height", "area", "rmax",
    "u", "v", "xi", "active", "id",
)

# Diagnostic hook (tools/measure_scaling.py): when True, every halo and
# migration ppermute uses the IDENTITY permutation (d -> d).  The program
# keeps its exact buffer shapes, packing work, and collision/coupling
# compute, but moves no data between devices - so the prod-vs-identity
# timing delta on a mesh isolates pure communication cost without the
# compute confound of shrinking the halo margin (a small margin also
# shrinks the extended collision pool, which changes compute).
COMM_IDENTITY = False


def comm_bytes_per_step(sim, dec) -> dict:
    """Per-device communication volume of one decomposed step, in bytes.

    Counts what each device SENDS per step through the three channels:
      * halo exchange: 2 directions x halo_cap rows of _HALO_FIELDS
        (2-D decomps exchange along both axes + corner pass-through)
      * migration: 2 directions x mig_cap rows of the FULL floe state
      * psum'd grid reductions at coupling cadence (two-way coupling) and
        the per-step overflow/fuse scalars (ring all-reduce sends ~2x the
        array per device)

    These are capacity bounds (ppermute always moves the full static
    buffer); the actual occupied rows are far fewer.  Used by
    tools/measure_scaling.py to project real-hardware efficiency from ICI
    bandwidth instead of host-memcpy timing on the CPU proxy mesh.
    """
    import numpy as np

    fl = sim.model.floes
    halo_row = sum(
        int(np.prod(getattr(fl, f).shape[1:]) or 1)
        * getattr(fl, f).dtype.itemsize
        for f in _HALO_FIELDS
    )
    full_row = sum(
        int(np.prod(a.shape[1:]) or 1) * a.dtype.itemsize for a in fl
    )
    n_axes = 2 if isinstance(dec, Decomp2D) else 1
    # 2-D corner coverage re-sends the already-received perpendicular halos
    # (two-pass scheme): count both passes
    halo_b = 2 * n_axes * dec.halo_cap * halo_row
    if n_axes == 2:
        halo_b += 2 * 2 * dec.halo_cap * halo_row  # corner pass-through
    mig_b = 2 * n_axes * dec.mig_cap * full_row
    grid_b = 0
    if sim.coupling_settings.coupling_on:
        oc = sim.model.ocean
        per_inv = sum(
            int(np.prod(a.shape) or 1) * a.dtype.itemsize
            for a in (oc.tau_x, oc.tau_y, oc.si_frac, oc.hflx_factor,
                      oc.dissolved)
        )
        if not sim.coupling_settings.two_way_coupling_on:
            per_inv = int(np.prod(oc.dissolved.shape)) * oc.dissolved.dtype.itemsize
        # ring all-reduce: each device sends ~2 * (D-1)/D ~ 2x the array
        grid_b = int(2 * per_inv / max(int(sim.coupling_settings.dt), 1))
    return {
        "halo_bytes": halo_b,
        "migration_bytes": mig_b,
        "grid_psum_bytes_amortized": grid_b,
        "total": halo_b + mig_b + grid_b,
        "halo_row_bytes": halo_row,
        "full_row_bytes": full_row,
    }


@dataclasses.dataclass(frozen=True)
class Decomp:
    """Static decomposition parameters (all shapes compile-time constants)."""

    mesh: Mesh
    axis: str            # mesh axis name
    n_dev: int           # devices along the axis
    local_cap: int       # per-device floe pool capacity
    halo_cap: int        # max floes ghosted across one slab edge
    mig_cap: int         # max floes migrating across one slab edge per step
    margin: float        # halo width (>= 2 * max floe radius)


def make_mesh_1d(n_devices: Optional[int] = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    return Mesh(np.array(devs[:n_devices]), axis_names=(axis,))


def make_decomp(
    floes: FloeState,
    domain: Domain,
    n_devices: Optional[int] = None,
    axis: str = "x",
    local_cap: Optional[int] = None,
    halo_cap: Optional[int] = None,
    mig_cap: Optional[int] = None,
    margin: Optional[float] = None,
) -> Decomp:
    """Choose decomposition capacities from the initial floe field."""
    mesh = make_mesh_1d(n_devices, axis)
    D = mesh.devices.size
    act = np.asarray(floes.active)
    cx = np.asarray(floes.centroid[:, 0])[act]
    rmax = np.asarray(floes.rmax)[act]
    vals = np.asarray(domain.vals, float)
    w, e = vals[WEST], vals[EAST]
    slab_w = (e - w) / D
    if margin is None:
        margin = float(2.2 * rmax.max()) if rmax.size else slab_w / 4
        # tiny pools / many devices: the production margin can exceed the
        # slab; clamp (the halo then covers the whole neighbor slab - more
        # traffic, still correct) so defaults work at any pool size
        margin = min(margin, float(slab_w))
    if margin > slab_w:
        raise ValueError(
            f"halo margin {margin:.3g} exceeds slab width {slab_w:.3g}; "
            f"use fewer devices or smaller floes"
        )
    slab = np.clip(((cx - w) / slab_w).astype(int), 0, D - 1)
    occ = np.bincount(slab, minlength=D)
    if local_cap is None:
        # headroom for density imbalance + fracture pieces
        local_cap = int(max(2 * occ.max() + 8, 16))
    if halo_cap is None:
        near = 0
        for d in range(D):
            lo = w + d * slab_w
            hi = lo + slab_w
            m = (slab == d) & (
                (cx - rmax < lo + margin) | (cx + rmax > hi - margin)
            )
            near = max(near, int(m.sum()))
        halo_cap = int(max(2 * near + 8, 8))
    if mig_cap is None:
        mig_cap = int(max(local_cap // 8, 8))
    return Decomp(
        mesh=mesh, axis=axis, n_dev=D, local_cap=local_cap,
        halo_cap=halo_cap, mig_cap=mig_cap, margin=float(margin),
    )


def distribute(floes: FloeState, domain: Domain, dec: Decomp, extra=None):
    """Partition a global floe pool into per-device local pools.

    Returns a FloeState whose arrays have leading shape [D * local_cap],
    device-sharded along the mesh axis (slab d occupies rows
    [d*local_cap, (d+1)*local_cap)).

    ``extra``: optional pytree of arrays with the same leading dim as the
    pool (e.g. per-floe instantaneous stress rows carried across a mid-step
    host pass); placed with the same row mapping and returned as a second
    output (then the return is a (floes, extra) tuple).
    """
    D, Nl = dec.n_dev, dec.local_cap
    act = np.asarray(floes.active)
    vals = np.asarray(domain.vals, float)
    w, e = vals[WEST], vals[EAST]
    slab_w = (e - w) / D
    cx = np.asarray(floes.centroid[:, 0])
    slab = np.clip(((cx - w) / slab_w).astype(int), 0, D - 1)

    def place(a):
        a = np.asarray(a)
        out = np.zeros((D * Nl,) + a.shape[1:], a.dtype)
        for d in range(D):
            rows = np.flatnonzero(act & (slab == d))
            if rows.size > Nl:
                raise ValueError(
                    f"slab {d} holds {rows.size} floes > local_cap {Nl}"
                )
            out[d * Nl : d * Nl + rows.size] = a[rows]
        # host numpy (not a local device array): device_put of a host array
        # onto a cross-process NamedSharding places each process's
        # addressable shards, so distribute() works unchanged multi-host
        return out

    stacked = jax.tree.map(place, floes)
    sharding = NamedSharding(dec.mesh, P(dec.axis))
    out = jax.tree.map(lambda a: jax.device_put(a, sharding), stacked)
    if extra is None:
        return out
    extra_out = jax.tree.map(
        lambda a: jax.device_put(place(a), sharding), extra
    )
    return out, extra_out


def gather(floes_dist: FloeState) -> FloeState:
    """Bring a distributed pool back to host as one (unordered) global pool.

    Multi-process: replicates across processes first (one all-gather), so
    EVERY process receives the identical full pool - the SPMD-host
    discipline run_decomp's lifecycle passes rely on (see
    parallel/multihost.py)."""
    from .multihost import replicate_to_host

    return jax.tree.map(jnp.asarray, replicate_to_host(floes_dist))


@partial(jax.jit, static_argnames=("host_cap",))
def _compact_active(floes_dist: FloeState, host_cap: int):
    """Device-side compaction of active rows into a [host_cap] pool.

    The lifecycle host passes only touch active floes, so gathering the full
    [D * local_cap] padded pool wastes device->host traffic proportional to
    the per-device headroom x device count; this keeps the transfer O(number
    of active floes).  Invalid rows are zeroed (fuse_with reset to -1) so
    they are safe free slots for fracture/weld piece appends.  Compaction
    renumbers rows, which is safe for fuse_with only because the distributed
    pools store partner IDs there, not row indices (_fuse_with_to_ids);
    run_decomp converts IDs back to compacted-pool rows afterwards.  Returns
    (compact_pool, overflow) - overflow means host_cap must grow."""
    N = floes_dist.capacity
    mask = floes_dist.active
    (sel,) = jnp.nonzero(mask, size=host_cap, fill_value=N)
    valid = sel < N
    safe = jnp.minimum(sel, N - 1)

    def take(a):
        v = valid.reshape((host_cap,) + (1,) * (a.ndim - 1))
        return jnp.where(v, a[safe], jnp.zeros_like(a[safe]))

    out = jax.tree.map(take, floes_dist)
    out = out._replace(
        active=out.active & valid,
        fuse_with=jnp.where(valid, out.fuse_with, -1),
    )
    overflow = jnp.sum(mask.astype(jnp.int32)) > host_cap
    return out, overflow


def gather_active(floes_dist: FloeState, host_cap: int):
    """gather() restricted to active rows: compact on device, then pull the
    [host_cap] pool to host (replicated to every process when multi-host).
    Returns (pool, overflow)."""
    from .multihost import mesh_of, replicate_to_host

    out, overflow = _compact_active(floes_dist, host_cap)
    mesh = mesh_of(floes_dist) if jax.process_count() > 1 else None
    out = jax.tree.map(jnp.asarray, replicate_to_host(out, mesh=mesh))
    return out, bool(overflow)


def _fuse_with_to_ids(fuse_with, ext: FloeState):
    """Translate collision fuse marks from extended-pool ROW indices to the
    partner floe's stable ID.

    In the distributed pools ``fuse_with`` stores partner IDs, not rows:
    local rows are renumbered by migration, halo rows (>= local_cap) only
    exist inside one device's step, and ``gather_active`` compacts rows
    again - a row index would dangle at every one of those seams, fusing the
    wrong floe (or indexing out of the host pool).  IDs survive all three;
    ``run_decomp`` maps them back to gathered-pool rows right before the
    host fuse pass (``_fuse_ids_to_rows``)."""
    cap = ext.capacity
    pid = ext.id[jnp.clip(fuse_with, 0, cap - 1)]
    return jnp.where(fuse_with >= 0, pid, -1).astype(jnp.int32)


def _fuse_ids_to_rows(floes: FloeState) -> FloeState:
    """Host-side inverse of _fuse_with_to_ids on a gathered pool: rewrite
    ``fuse_with`` partner IDs as row indices (what lifecycle_host.fuse_floes
    consumes).  Partners whose ID no longer exists in the pool (removed or
    dissolved since the mark) are cleared to -1."""
    fw = np.asarray(floes.fuse_with)
    marked = np.nonzero(fw >= 0)[0]
    if marked.size == 0:
        return floes
    ids = np.asarray(floes.id)
    act = np.asarray(floes.active)
    lookup = {int(ids[r]): int(r) for r in np.nonzero(act)[0]}
    out = np.full_like(fw, -1)
    for r in marked:
        p = lookup.get(int(fw[r]), -1)
        # a floe paired with its own periodic halo image maps to itself;
        # fusing a floe with itself is meaningless - drop the mark
        out[r] = -1 if p == r else p
    return floes._replace(fuse_with=jnp.asarray(out))


def _pack(floes: FloeState, mask, cap: int, fields):
    """Compact masked floes into a fixed [cap] buffer of the given fields."""
    N = floes.capacity
    (sel,) = jnp.nonzero(mask, size=cap, fill_value=N)
    valid = sel < N
    safe = jnp.minimum(sel, N - 1)
    out = {f: getattr(floes, f)[safe] for f in fields}
    out["active"] = out["active"] & valid
    n_over = jnp.sum(mask.astype(jnp.int32)) > cap
    return out, n_over


def _as_halo_state(template: FloeState, packed: dict, cap: int) -> FloeState:
    """A FloeState of capacity cap with the packed fields filled in and all
    other fields zero (halo copies never need them)."""
    base = jax.tree.map(
        lambda a: jnp.zeros((cap,) + a.shape[1:], a.dtype), template
    )
    return base._replace(**packed)


def _shift_x(state_dict: dict, dx):
    out = dict(state_dict)
    out["verts"] = state_dict["verts"] + jnp.stack(
        [jnp.broadcast_to(dx, state_dict["verts"].shape[:1]),
         jnp.zeros(state_dict["verts"].shape[:1],
                   state_dict["verts"].dtype)], axis=-1)[:, None, :]
    out["centroid"] = state_dict["centroid"] + jnp.stack(
        [jnp.broadcast_to(dx, state_dict["centroid"].shape[:1]),
         jnp.zeros(state_dict["centroid"].shape[:1],
                   state_dict["centroid"].dtype)], axis=-1)
    return out


def _make_parts_1d(sim, dec: Decomp, row_cap=None):
    """The per-device SPMD step of the 1-D decomposition, split in two:

      collide_local(floes, ocean, domain, tstep)
          -> (floes, domain, stress_instant, overflow)   [halo + collisions]
      finish_local(floes, ocean, domain, stress_instant, tstep)
          -> (floes, ocean, domain, overflow)  [coupling/integrate/migrate]

    mirroring simulation.build_step_parts so the host ridge/raft pass can
    run at the reference's mid-step position over the gathered pool
    (simulation.jl:121-135).  Both halves psum their overflow flag so the
    returned scalar is replicated-consistent."""
    grid = sim.model.grid
    atmos = sim.model.atmos
    consts = sim.consts
    dt = float(sim.dt)
    fs = sim.floe_settings
    cps = sim.coupling_settings
    cls = sim.collision_settings
    D = dec.n_dev
    Nl = dec.local_cap
    H = dec.halo_cap
    Hm = dec.mig_cap
    axis = dec.axis
    ext_cap = Nl + 2 * H
    # keep the same per-floe candidate budget as the single-device config.
    # row_cap must be derived from the USER pool's capacity; run_decomp
    # snapshots it at entry because writers replace sim.model.floes with the
    # (much larger) gathered pool mid-run, which would silently shrink the
    # per-floe budget of any program built after the first writer fired.
    if row_cap is None:
        row_cap = max(sim.pair_cap // max(sim.model.floes.capacity, 1), 8)
    # only the Nl local rows consume candidate budget (owned_rows prunes
    # halo rows from the broad phase).  Seam rows own their full halo
    # contact degree instead of the parity-halved share; the second-chance
    # spill list (_extra_cap) absorbs those few deep rows, so the global
    # budget stays at the single-device row_cap * pool size.
    pair_cap = max(row_cap * Nl, 256)

    # ppermute perms: send right = (d -> d+1), send left = (d -> d-1)
    def perms(domain: Domain):
        if COMM_IDENTITY:  # timing diagnostic: same shapes, no data motion
            ident = [(d, d) for d in range(D)]
            return ident, ident
        wrap = domain.ew_periodic
        right = [(d, (d + 1) % D) for d in range(D if wrap else D - 1)]
        left = [((d + 1) % D, d) for d in range(D if wrap else D - 1)]
        return right, left

    def pshuffle(tree, perm):
        return jax.tree.map(
            lambda a: jax.lax.ppermute(a, axis, perm), tree
        )

    def collide_local(floes, ocean, domain: Domain, tstep):
        # floes arrive as the local [Nl, ...] slab block
        me = jax.lax.axis_index(axis)
        w_val = domain.vals[WEST]
        e_val = domain.vals[EAST]
        Lx = e_val - w_val
        slab_w = Lx / D
        lo = w_val + me.astype(Lx.dtype) * slab_w
        hi = lo + slab_w
        overflow = jnp.asarray(False)
        perm_r, perm_l = perms(domain)

        # ---- 1. halo exchange (ghost floes across slab edges) ------------
        # A 1-slab axis needs no halos at all: the local pool holds every
        # floe and the collision kernel's min-image shifts already cover
        # periodic wrap (find_candidate_pairs) - a D=1 decomposition then
        # runs the exact single-device compute.
        if D == 1:
            ext = floes
        else:
            cx = floes.centroid[:, 0]
            r = floes.rmax
            send_l_mask = floes.active & (cx - r < lo + dec.margin)
            send_r_mask = floes.active & (cx + r > hi - dec.margin)
            pk_l, ov1 = _pack(floes, send_l_mask, H, _HALO_FIELDS)
            pk_r, ov2 = _pack(floes, send_r_mask, H, _HALO_FIELDS)
            overflow = overflow | ov1 | ov2
            # receive from right neighbor (their left-edge floes) and left
            recv_from_right = pshuffle(pk_l, perm_l)
            recv_from_left = pshuffle(pk_r, perm_r)
            if COMM_IDENTITY:
                # identity-perm diagnostic: self-copies would sit exactly on
                # the sender's own floes (instant fuse marks + degenerate
                # contacts) - deactivate them; all shapes/padded compute stay
                # identical to the production program
                recv_from_right = dict(
                    recv_from_right,
                    active=jnp.zeros_like(recv_from_right["active"]),
                )
                recv_from_left = dict(
                    recv_from_left,
                    active=jnp.zeros_like(recv_from_left["active"]),
                )
            if domain.ew_periodic:
                # periodic wrap: device 0's left neighbor is D-1 whose floes
                # sit near the east edge - shift them west by Lx (mirrored)
                recv_from_left = _shift_x(
                    recv_from_left, jnp.where(me == 0, -Lx, 0.0)
                )
                recv_from_right = _shift_x(
                    recv_from_right, jnp.where(me == D - 1, Lx, 0.0)
                )
            halo_l = _as_halo_state(floes, recv_from_left, H)
            halo_r = _as_halo_state(floes, recv_from_right, H)
            ext = jax.tree.map(
                lambda a, b, c: jnp.concatenate([a, b, c], axis=0),
                floes, halo_l, halo_r,
            )

        # ---- 2. collisions on the extended pool --------------------------
        stress_instant = jnp.zeros_like(floes.stress_accum)
        if cls.collisions_on:
            res = _collisions.timestep_collisions(
                ext, domain, consts, dt, cls, pair_cap, sim.clip_cap, None,
                owned_rows=Nl,
            )
            # keep only the local slice; halo force accumulations are the
            # neighbor's responsibility (it computes the seam pair itself)
            loc = jax.tree.map(lambda a: a[:Nl], res.floes)
            floes = floes._replace(
                collision_force=loc.collision_force,
                collision_trq=loc.collision_trq,
                overarea=loc.overarea,
                remove=loc.remove,
                fuse_with=_fuse_with_to_ids(loc.fuse_with, ext),
            )
            stress_instant = res.stress_instant[:Nl]
            overflow = overflow | res.overflow
        domain = domain.update_boundaries(dt)
        overflow = jax.lax.psum(overflow.astype(jnp.int32), axis) > 0
        return floes, domain, stress_instant, overflow

    def finish_local(floes, ocean, domain: Domain, stress_instant, tstep):
        me = jax.lax.axis_index(axis)
        w_val = domain.vals[WEST]
        e_val = domain.vals[EAST]
        Lx = e_val - w_val
        slab_w = Lx / D
        overflow = jnp.asarray(False)
        perm_r, perm_l = perms(domain)

        # ---- 3. coupling (psum-reduced grid sums) -------------------------
        if cps.coupling_on:
            def do_coupling(args):
                floes_, ocean_ = args
                return _coupling.timestep_coupling(
                    floes_, grid, domain, ocean_, atmos, consts, cps, fs,
                    dt, sim.cell_cap, axis_name=axis,
                )

            def skip_coupling(args):
                floes_, ocean_ = args
                if cps.two_way_coupling_on:
                    # keep collective structure identical on both branches
                    zero = jax.lax.psum(
                        jnp.zeros((), ocean_.tau_x.dtype), axis
                    )
                    ocean_ = ocean_._replace(tau_x=ocean_.tau_x + zero)
                return floes_, ocean_, jnp.asarray(False)

            floes, ocean, cp_overflow = jax.lax.cond(
                jnp.mod(tstep, cps.dt) == 0, do_coupling, skip_coupling,
                (floes, ocean),
            )
            overflow = overflow | cp_overflow

        # ---- 4. integrate + periodic wrap ---------------------------------
        floes = _update_floe.timestep_floe_properties(
            floes, dt, fs, stress_instant
        )
        floes = _update_floe.wrap_periodic(floes, domain)

        # ---- 5. removal / dissolution (psum dissolved deposit) ------------
        diss0 = ocean.dissolved
        floes, ocean = _simplification.remove_and_dissolve(
            floes, ocean, grid, domain, fs
        )
        ocean = ocean._replace(
            dissolved=diss0 + jax.lax.psum(ocean.dissolved - diss0, axis)
        )

        # ---- 6. migration of floes that crossed a slab edge ---------------
        # (a 1-slab axis owns everything - nothing can migrate)
        if D > 1:
            cx = floes.centroid[:, 0]
            dest = jnp.clip(
                jnp.floor((cx - w_val) / slab_w).astype(jnp.int32), 0, D - 1
            )
            hop = jnp.mod(dest - me, D)
            go_right = floes.active & (hop >= 1) & (hop <= D // 2)
            go_left = floes.active & (dest != me) & ~go_right
            mig_fields = floes._fields
            mg_r, ov3 = _pack(floes, go_right, Hm, mig_fields)
            mg_l, ov4 = _pack(floes, go_left, Hm, mig_fields)
            overflow = overflow | ov3 | ov4
            floes = floes._replace(
                active=floes.active & ~(go_right | go_left)
            )
            recv_r = pshuffle(mg_l, perm_l)   # from right neighbor
            recv_l = pshuffle(mg_r, perm_r)   # from left neighbor
            # insert received floes into free slots
            free = ~floes.active
            (fidx,) = jnp.nonzero(free, size=2 * Hm, fill_value=Nl)
            for k, recv in enumerate((recv_l, recv_r)):
                slots = fidx[k * Hm : (k + 1) * Hm]
                ok = recv["active"] & (slots < Nl)
                overflow = overflow | jnp.any(recv["active"] & (slots >= Nl))
                idx = jnp.where(ok, slots, Nl)
                floes = floes._replace(**{
                    f: getattr(floes, f).at[idx].set(recv[f], mode="drop")
                    for f in mig_fields
                })
                # only genuinely received floes become active
                floes = floes._replace(
                    active=floes.active.at[idx].set(ok, mode="drop")
                )

        overflow = jax.lax.psum(overflow.astype(jnp.int32), axis) > 0
        return floes, ocean, domain, overflow

    return collide_local, finish_local


def _compose_parts(collide_local, finish_local):
    def local_step(floes, ocean, domain, tstep):
        floes, domain, si, ov1 = collide_local(floes, ocean, domain, tstep)
        floes, ocean, domain, ov2 = finish_local(
            floes, ocean, domain, si, tstep
        )
        return floes, ocean, domain, ov1 | ov2

    return local_step


def _dec_parts(sim, dec, row_cap=None):
    """(collide_local, finish_local, axes) for a 1-D or 2-D decomposition;
    axes is the mesh-axis name (or tuple) collectives reduce over."""
    if isinstance(dec, Decomp):
        c, f = _make_parts_1d(sim, dec, row_cap)
        return c, f, dec.axis
    c, f = _make_parts_2d(sim, dec, row_cap)
    return c, f, ("x", "y")


def _dec_specs(dec):
    axes = dec.axis if isinstance(dec, Decomp) else ("x", "y")
    return P(axes)


def build_decomp_step(sim, dec, row_cap=None):
    """Compile one distributed step: (floes_dist, ocean, domain, tstep) ->
    (floes_dist, ocean, domain, overflow).

    ``sim`` provides the physics configuration (same Simulation object as the
    single-device path); the floe pool argument must come from
    ``distribute``.  Host life-cycle passes (fracture/weld/ridge-raft) are
    not distributed: run them on ``gather``-ed state at their low cadences.
    """
    collide_local, finish_local, _ = _dec_parts(sim, dec, row_cap)
    local_step = _compose_parts(collide_local, finish_local)
    spec = _dec_specs(dec)
    fn = jax.shard_map(
        local_step,
        mesh=dec.mesh,
        in_specs=(spec, P(), P(), P()),
        out_specs=(spec, P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def build_decomp_step_halves(sim, dec, row_cap=None):
    """The two jitted halves of the distributed step (collide / finish),
    for the mid-step host ridge/raft placement (the distributed analog of
    simulation.build_step_parts):

      collide(floes_d, ocean, domain, tstep)
          -> (floes_d, domain, stress_instant_d, overflow)
      finish(floes_d, ocean, domain, stress_instant_d, tstep)
          -> (floes_d, ocean, domain, overflow)
    """
    collide_local, finish_local, _ = _dec_parts(sim, dec, row_cap)
    spec = _dec_specs(dec)
    collide = jax.shard_map(
        collide_local,
        mesh=dec.mesh,
        in_specs=(spec, P(), P(), P()),
        out_specs=(spec, P(), spec, P()),
        check_vma=False,
    )
    finish = jax.shard_map(
        finish_local,
        mesh=dec.mesh,
        in_specs=(spec, P(), P(), spec, P()),
        out_specs=(spec, P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(collide), jax.jit(finish)


def build_decomp_segment(sim, dec, row_cap=None, collect=None, seg_cap=None):
    """Device-resident multi-step segment runner for the distributed path:

      seg(floes_d, ocean, domain, t0, t_stop)
          -> (floes_d, ocean, domain, t_reached, n_overflow, fuse[, buf])

    Advances whole steps inside ONE jitted lax.while_loop (inside the
    shard_map, so halo/migration ppermutes and grid psums run every
    iteration with no host round-trip) until t_stop, exiting early when
    collisions mark a fuse pair - the same segment discipline as the
    single-device run() (simulation.py run_segment), which run_decomp
    previously lacked (it paid a host sync per step).

    ``collect(floes_local, ocean)`` maps the post-step LOCAL pool to
    per-step outputs that are psum-reduced across the mesh, so it must
    return quantities additive over floes (sums of KE, momentum, mass, ...
    over active local rows - the persistent local pools hold only owned
    floes, so the psum is exact).  Rows [0, seg_cap) of the returned
    ``buf`` hold steps t0..t_reached-1."""
    collide_local, finish_local, axes = _dec_parts(sim, dec, row_cap)
    local_step = _compose_parts(collide_local, finish_local)
    check_fuse = sim.collision_settings.collisions_on
    spec = _dec_specs(dec)

    def seg_local(floes, ocean, domain, t0, t_stop):
        if collect is not None:
            proto = jax.eval_shape(collect, floes, ocean)
            buf0 = jax.tree.map(
                lambda s: jnp.zeros((seg_cap,) + s.shape, s.dtype), proto
            )
        else:
            buf0 = ()

        def cond_fn(c):
            t, fuse = c[3], c[5]
            return (t < t_stop) & ~fuse

        def body_fn(c):
            fl, oc, dm, t, nov, _, buf = c
            fl, oc, dm, ov = local_step(fl, oc, dm, t)
            if check_fuse:
                fuse = jax.lax.psum(
                    jnp.any(fl.fuse_with >= 0).astype(jnp.int32), axes
                ) > 0
            else:
                fuse = jnp.asarray(False)
            if collect is not None:
                out = jax.tree.map(
                    lambda o: jax.lax.psum(o, axes), collect(fl, oc)
                )
                buf = jax.tree.map(
                    lambda b, o: jax.lax.dynamic_update_index_in_dim(
                        b, o.astype(b.dtype), t - t0, 0
                    ),
                    buf, out,
                )
            return (fl, oc, dm, t + 1, nov + ov.astype(jnp.int32), fuse, buf)

        return jax.lax.while_loop(
            cond_fn, body_fn,
            (floes, ocean, domain, t0,
             jnp.zeros((), jnp.int32), jnp.asarray(False), buf0),
        )

    fn = jax.shard_map(
        seg_local,
        mesh=dec.mesh,
        in_specs=(spec, P(), P(), P(), P()),
        out_specs=(spec, P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def _dec_ndev(dec) -> int:
    """Total device count of a 1-D Decomp or 2-D Decomp2D."""
    return dec.n_dev if isinstance(dec, Decomp) else dec.dx_dev * dec.dy_dev


def _dec_build(sim, dec, row_cap=None):
    return build_decomp_step(sim, dec, row_cap)


def _dec_distribute(floes: FloeState, domain: Domain, dec, extra=None):
    if isinstance(dec, Decomp):
        return distribute(floes, domain, dec, extra=extra)
    return distribute_2d(floes, domain, dec, extra=extra)


def _dec_grow(dec):
    """The same decomposition with doubled per-device capacities (used when
    fracture/welding grow a slab past local_cap)."""
    return dataclasses.replace(
        dec, local_cap=2 * dec.local_cap, halo_cap=2 * dec.halo_cap,
        mig_cap=2 * dec.mig_cap,
    )


class _NullLogger:
    """Logger stand-in for non-I/O processes of a multi-host run."""

    def log(self, *a, **k):
        pass

    def warn(self, *a, **k):
        pass

    def close(self):
        pass


def run_decomp(sim, dec, start_tstep: int = 0, callback=None, collect=None):
    """run! over a 1-D (``Decomp``) or 2-D (``Decomp2D``) domain
    decomposition (the distributed analog of simulation.run, mirroring
    timestep_sim!'s process order,
    /root/reference/src/simulation_components/simulation.jl:94-220).

    Between host events (writer intervals, lifecycle cadences) the
    distributed steps advance inside ONE jitted lax.while_loop under the
    shard_map (build_decomp_segment) - no host round-trip per step, the
    same segment discipline as the single-device run().  The loop exits
    early when collisions mark a fuse pair (same-step fusing).  At
    host-process cadences (ridge/raft, fracture, welding, smoothing,
    fusing) only active rows are gathered to the host, the lifecycle passes
    run on the global pool, and the result is redistributed (new pieces
    land on their owning slab).  With ``sim.interleave_ridge_raft`` (the
    default, matching the single-device driver) the ridge/raft pass runs at
    the reference's mid-step position between the collide and finish halves
    of the distributed step (simulation.jl:108-135).  Writers fire on
    gathered state at their intervals.  Overflow (halo/migration/pair
    capacity) is reported exactly like the single-device driver.

    ``collect(floes_local, ocean)`` accumulates per-step diagnostics
    device-side at segment speed; outputs must be additive over floes
    (they are psum-reduced across the mesh - see build_decomp_segment).
    When given, returns ``(sim, collected)`` with entries stacked over
    steps.

    Returns ``sim`` with its model holding the final gathered pool.
    """
    from ..io.logger import SimulationLogger
    from ..physics import lifecycle_host as _lifecycle
    from ..simulation import _host_lifecycle_passes, _host_ridge_raft
    from .multihost import is_io_process

    # multi-process (multi-host) runs execute this loop SPMD on every
    # process: device state is globally sharded, host lifecycle passes run
    # identically everywhere on replicated gathers (parallel/multihost.py),
    # and only process 0 performs I/O (writers, log file, progress prints)
    io_proc = is_io_process()
    logger = SimulationLogger(sim.name) if io_proc else _NullLogger()
    # compiled programs, built lazily and invalidated together whenever the
    # decomposition or a static capacity changes (_dec_grow / cell_cap)
    programs = {}

    # snapshot the per-floe candidate budget from the USER pool before any
    # writer replaces sim.model.floes with the gathered (D * local_cap) pool
    row_cap = max(sim.pair_cap // max(sim.model.floes.capacity, 1), 8)

    def get_program(kind):
        if kind not in programs:
            if kind == "step":
                programs[kind] = _dec_build(sim, dec, row_cap)
            elif kind == "seg":
                programs[kind] = build_decomp_segment(
                    sim, dec, row_cap, collect=collect, seg_cap=seg_cap
                )
            elif kind == "halves":
                programs[kind] = build_decomp_step_halves(sim, dec, row_cap)
            elif kind == "collect":
                spec = _dec_specs(dec)
                axes = spec[0]

                def _collect_local(fl, oc):
                    return jax.tree.map(
                        lambda o: jax.lax.psum(o, axes), collect(fl, oc)
                    )

                programs[kind] = jax.jit(jax.shard_map(
                    _collect_local, mesh=dec.mesh,
                    in_specs=(spec, P()), out_specs=P(), check_vma=False,
                ))
        return programs[kind]

    domain = sim.model.domain
    floes_d = _dec_distribute(sim.model.floes, domain, dec)
    ocean = sim.model.ocean
    rng = np.random.default_rng(sim.seed)
    if sim.rng_state is not None:
        rng.bit_generator.state = sim.rng_state
    state = {"max_floe_id": int(jnp.max(sim.model.floes.id))}
    # the gathered pool has capacity D * local_cap: the host overlap query's
    # pair budget is set (as row_cap * gathered capacity) right before each
    # _host_lifecycle_passes call, since _dec_grow can change the capacity
    host_sim = copy.copy(sim)
    host_sim.bins = None  # gathered pool is unsorted; dense broad phase

    rr = sim.ridgeraft_settings
    rr_on = rr.ridge_raft_on and rr.dt > 0
    rr_mid_step = sim.interleave_ridge_raft and rr_on

    def host_ops_due(tstep, include_rr=True):
        if tstep <= 0:
            return False
        fr = sim.fracture_settings
        ws = sim.weld_settings
        sp = sim.simp_settings
        due = (
            (include_rr and rr_on and tstep % rr.dt == 0)
            or (fr.fractures_on and fr.dt > 0 and tstep % fr.dt == 0)
            or (ws.weld_on and any(tstep % wdt == 0 for wdt in ws.dts))
            or (
                sp.smooth_vertices_on
                and sp.dt_smooth > 0
                and tstep % sp.dt_smooth == 0
            )
        )
        return due

    def writers_due(tstep):
        w = sim.writers
        if w is None:
            return False
        return (
            (tstep == start_tstep and w.initial_state is not None)
            or (w.floes is not None and tstep % w.floes.interval == 0)
            or (w.grid is not None and tstep % w.grid.interval == 0)
            or (w.checkpoint is not None and tstep % w.checkpoint.interval == 0)
        )

    has_collision_fusing = sim.collision_settings.collisions_on
    n_overflow = 0

    def _cell_cap_needed(g) -> int:
        """The two-way-coupling window size the current pool requires (the
        same formula as Simulation.__post_init__); welding/fusing can grow
        rmax past the compiled window without ever overflowing a slab, so
        this is checked after EVERY host lifecycle pass."""
        rmax_now = float(jnp.max(jnp.where(g.active, g.rmax, 0.0)))
        gr = sim.model.grid
        cap = int(2 * np.ceil(1.5 * rmax_now / min(gr.dx, gr.dy)) + 3)
        return min(cap, max(gr.Nx, gr.Ny) + 1)
    # lifecycle gathers pull only active rows (device-side compaction keeps
    # the device->host transfer O(active), not O(devices * local_cap)).
    # host_cap tracks the live active count with enough headroom for one
    # full fracture pass (npieces per floe) + welding/ridge pieces; it is
    # sticky (only grows) so the compaction kernel recompiles O(log growth)
    # times over a run.
    fr_np = (
        sim.fracture_settings.npieces
        if sim.fracture_settings.fractures_on
        else 1
    )
    headroom = fr_np + 1

    def _host_cap_for(n_act, cur=0):
        # NOT capped at the distributed capacity: the host pool must hold
        # originals + freshly fractured pieces before _dec_distribute
        # rebalances (and _dec_grow grows the slabs if needed)
        want = ((headroom * n_act + 64 + 63) // 64) * 64
        return max(want, cur, 128)

    host_cap = _host_cap_for(int(jnp.sum(sim.model.floes.active)))

    def gather_active_grow(floes_d):
        nonlocal host_cap
        host_cap = _host_cap_for(int(jnp.sum(floes_d.active)), cur=host_cap)
        g, hc_over = gather_active(floes_d, host_cap)
        while hc_over:
            host_cap = 2 * host_cap
            g, hc_over = gather_active(floes_d, host_cap)
        return _fuse_ids_to_rows(g)

    def redistribute(g, tstep, extra=None):
        """Re-place a host pool onto the decomposition, growing slab
        capacities and/or the coupling window (recompile) as needed."""
        nonlocal dec
        rebuild = False
        if sim.coupling_settings.two_way_coupling_on:
            cap = _cell_cap_needed(g)
            if cap > sim.cell_cap:
                sim.cell_cap = cap
                rebuild = True
                logger.warn(
                    f"floe growth outran the two-way coupling window: "
                    f"growing cell_cap to {cap} and recompiling",
                    tstep,
                )
        try:
            if rebuild:
                programs.clear()
            return _dec_distribute(g, domain, dec, extra=extra)
        except ValueError:
            # fracture/welding grew a slab past local_cap: rebuild the
            # decomposition with more headroom (rare recompile; the
            # fixed-shape analog of the reference's growable arrays)
            dec = _dec_grow(dec)
            logger.warn(
                f"slab overflow: growing local_cap to {dec.local_cap} "
                "and recompiling the decomposed step",
                tstep,
            )
            programs.clear()
            return _dec_distribute(g, domain, dec, extra=extra)

    # ---- segment scheduling (mirrors simulation.run) ----------------------
    # Between host events the distributed steps run inside ONE jitted
    # lax.while_loop under the shard_map (build_decomp_segment), exiting
    # early when collisions mark a fuse pair; the driver only syncs at
    # writer/verbose/lifecycle-cadence steps.
    use_segments = callback is None
    pre_cads = []
    post_cads = []
    if use_segments:
        if sim.writers is not None:
            for w in (sim.writers.floes, sim.writers.grid,
                      sim.writers.checkpoint):
                if w is not None:
                    pre_cads.append(w.interval)
        if sim.verbose:
            pre_cads.append(50)
        if rr_mid_step:
            pre_cads.append(rr.dt)
        elif rr_on:
            post_cads.append(rr.dt)
        fr = sim.fracture_settings
        if fr.fractures_on and fr.dt > 0:
            post_cads.append(fr.dt)
        if sim.weld_settings.weld_on:
            post_cads.extend(sim.weld_settings.dts)
        if (
            sim.simp_settings.smooth_vertices_on
            and sim.simp_settings.dt_smooth > 0
        ):
            post_cads.append(sim.simp_settings.dt_smooth)

    # collect buffer capacity = longest possible segment (static shape)
    seg_cap = sim.n_dt + 1
    for c in pre_cads + post_cads:
        seg_cap = min(seg_cap, c)
    seg_cap = max(1, min(seg_cap, 2048))
    collected = []

    def _next_on(t, c, skip_zero):
        s = ((t + c - 1) // c) * c
        return c if (skip_zero and s == 0) else s

    end_tstep = start_tstep + sim.n_dt
    tstep = start_tstep
    while tstep <= end_tstep:
        if use_segments:
            t_stop = min(end_tstep + 1, tstep + seg_cap)
            for c in pre_cads:
                t_stop = min(t_stop, _next_on(tstep, c, skip_zero=False))
            for c in post_cads:
                t_stop = min(t_stop, _next_on(tstep, c, skip_zero=True))
            if t_stop > tstep:
                seg = get_program("seg")
                floes_d, ocean, domain, t_dev, nov, fuse, buf = seg(
                    floes_d, ocean, domain,
                    jnp.asarray(tstep, jnp.int32),
                    jnp.asarray(t_stop, jnp.int32),
                )
                nov = int(nov)
                seg_len = int(t_dev) - tstep
                tstep = int(t_dev)
                if collect is not None and seg_len > 0:
                    collected.append(jax.tree.map(lambda a: a[:seg_len], buf))
                if nov:
                    n_overflow += nov
                    logger.warn(
                        f"halo/migration/pair capacity exceeded on {nov} of "
                        f"the last {seg_len} steps; results may be "
                        "incomplete",
                        tstep - 1,
                    )
                if bool(fuse) and has_collision_fusing:
                    # same-step fusing: the host fuse pass must run before
                    # the next step (collisions.jl:364-368)
                    g = gather_active_grow(floes_d)
                    g, state["max_floe_id"] = _lifecycle.fuse_floes(
                        g, state["max_floe_id"], sim.floe_settings,
                        float(sim.dt), rng,
                    )
                    floes_d = redistribute(g, tstep)
                continue  # tstep now sits on a host event (or past the end)
        if sim.verbose and tstep % 50 == 0 and io_proc:
            print(f"{tstep} timesteps")
        if callback is not None or writers_due(tstep):
            # the gather is a collective - every process participates even
            # though only process 0 writes
            g = gather(floes_d)
            if callback is not None:
                callback(tstep, g, ocean, domain)
            if writers_due(tstep) and io_proc:
                sim.model = sim.model.replace(
                    floes=g, ocean=ocean, domain=domain
                )
                sim.writers.write_data(
                    sim, tstep, g, ocean, domain,
                    rng_state=rng.bit_generator.state,
                )
        rr_now = rr_mid_step and tstep % rr.dt == 0 and tstep > 0
        if rr_now:
            # the reference's mid-step ridge/raft placement: collisions ->
            # ridge/raft -> coupling/integration (simulation.jl:108-135).
            # The full pool is gathered 1:1 (rows aligned with the
            # distributed layout), the host pass mutates it in place, and
            # distribute(extra=...) re-places the per-floe instantaneous
            # stress rows alongside the floes (pieces created mid-step
            # carry zero stress, exactly like the single-device driver).
            collide_d, finish_d = get_program("halves")
            floes_d, domain, si_d, ov1 = collide_d(
                floes_d, ocean, domain, jnp.asarray(tstep)
            )
            g = gather(floes_d)
            # si_d is sharded like floes_d; on a multi-process run its
            # shards span non-addressable devices, so replicate before the
            # host copy (same route gather() takes).
            from .multihost import replicate_to_host

            si = jnp.asarray(replicate_to_host(si_d))
            host_sim.pair_cap = row_cap * g.capacity
            g = _host_ridge_raft(
                host_sim, g, domain, tstep, rng, state, logger
            )
            floes_d, si_d = redistribute(g, tstep, extra=si)
            collide_d, finish_d = get_program("halves")
            floes_d, ocean, domain, ov2 = finish_d(
                floes_d, ocean, domain, si_d, jnp.asarray(tstep)
            )
            overflow = bool(ov1) | bool(ov2)
        else:
            step = get_program("step")
            floes_d, ocean, domain, overflow = step(
                floes_d, ocean, domain, jnp.asarray(tstep)
            )
        if collect is not None:
            collected.append(
                jax.tree.map(
                    lambda a: a[None],
                    get_program("collect")(floes_d, ocean),
                )
            )
        if bool(overflow):
            n_overflow += 1
            logger.warn(
                "halo/migration/pair capacity exceeded; results may be "
                "incomplete this step",
                tstep,
            )
        need_host = host_ops_due(tstep, include_rr=not rr_now) or (
            has_collision_fusing and bool(jnp.any(floes_d.fuse_with >= 0))
        )
        if need_host:
            g = gather_active_grow(floes_d)
            host_sim.pair_cap = row_cap * g.capacity
            g = _host_lifecycle_passes(
                host_sim, g, domain, tstep, rng, state, logger,
                skip_ridge_raft=rr_now,
            )
            floes_d = redistribute(g, tstep)
        tstep += 1
    n_overflow += state.get("n_overflow", 0)
    if n_overflow and io_proc:
        import warnings

        warnings.warn(
            f"{n_overflow} steps exceeded a decomposition capacity; results "
            "may be inaccurate. Increase halo/mig/pair caps."
        )
    if sim.writers is not None and io_proc:
        sim.writers.close()
    logger.close()
    sim.model = sim.model.replace(
        floes=gather(floes_d), ocean=ocean, domain=domain
    )
    if collect is not None:
        out = (
            jax.tree.map(
                lambda *xs: jnp.concatenate(
                    [jnp.asarray(x) for x in xs], axis=0
                ),
                *collected,
            )
            if collected else None
        )
        return sim, out
    return sim


def measure_decomp_scaling(
    sim_builder, n_steps: int = 20, axis: str = "x", n_dev=None,
    segment: bool = False,
):
    """Steps/s of the decomposed step on 1 device vs ``n_dev`` devices.

    ``sim_builder()`` must return a fresh Simulation (the decomposition
    mutates capacities).  ``n_dev``: None -> 1-D over all devices; an int ->
    1-D over that many x-slabs; an (Dx, Dy) tuple -> 2-D slab mesh.
    ``segment=True`` measures the production device-resident while_loop
    driver (build_decomp_segment, what run_decomp dispatches) instead of
    per-step jit dispatch.

    Returns {1: sps, n_dev: sps, "efficiency": e} where efficiency =
    sps_D / sps_1 (same global problem, strong scaling - ideal is 1.0; the
    single-device run does the same work with no communication).
    """
    import time

    if n_dev is None:
        n_dev = len(jax.devices())
    res = {}
    for nd in (1, n_dev):
        sim = sim_builder()
        if isinstance(nd, tuple):
            dec = make_decomp_2d(sim.model.floes, sim.model.domain, n_dev=nd)
        else:
            dec = make_decomp(sim.model.floes, sim.model.domain, n_devices=nd)
        floes_d = _dec_distribute(sim.model.floes, sim.model.domain, dec)
        ocean = sim.model.ocean
        domain = sim.model.domain
        if segment:
            seg = build_decomp_segment(sim, dec)
            out = seg(floes_d, ocean, domain, jnp.asarray(0), jnp.asarray(1))
            jax.block_until_ready(out[0].centroid)
            floes_d, ocean, domain = out[0], out[1], out[2]
            t0 = time.perf_counter()
            out = seg(
                floes_d, ocean, domain, jnp.asarray(1),
                jnp.asarray(1 + n_steps),
            )
            jax.block_until_ready(out[0].centroid)
            elapsed = time.perf_counter() - t0
            done = int(out[3]) - 1  # fuse marks can exit the segment early
            res[nd] = max(done, 1) / elapsed
        else:
            step = build_decomp_step(sim, dec)
            out = step(floes_d, ocean, domain, jnp.asarray(0))
            jax.block_until_ready(out[0].centroid)
            floes_d, ocean, domain = out[0], out[1], out[2]
            t0 = time.perf_counter()
            for k in range(1, n_steps + 1):
                floes_d, ocean, domain, _ = step(
                    floes_d, ocean, domain, jnp.asarray(k)
                )
            jax.block_until_ready(floes_d.centroid)
            res[nd] = n_steps / (time.perf_counter() - t0)
    res["efficiency"] = res[n_dev] / res[1]
    return res


# ---------------------------------------------------------------------------
# 2-D (x, y) domain decomposition
# ---------------------------------------------------------------------------

def _shift_xy(state_dict: dict, dx, dy):
    """Translate packed halo/migration buffers by (dx, dy)."""
    out = dict(state_dict)
    n = state_dict["centroid"].shape[0]
    dtype = state_dict["centroid"].dtype
    sv = jnp.stack(
        [jnp.broadcast_to(dx, (n,)), jnp.broadcast_to(dy, (n,))], axis=-1
    ).astype(dtype)
    out["verts"] = state_dict["verts"] + sv[:, None, :]
    out["centroid"] = state_dict["centroid"] + sv
    return out


@dataclasses.dataclass(frozen=True)
class Decomp2D:
    """Static 2-D decomposition parameters (SURVEY §7.2-8 groundwork):
    the domain splits into Dx x Dy rectangular slabs; halo exchange runs
    x-axis first, then y-axis over the x-extended pool, so corner-diagonal
    neighbors are reached with 4 ppermutes instead of 8."""

    mesh: Mesh
    dx_dev: int
    dy_dev: int
    local_cap: int
    halo_cap: int
    mig_cap: int
    margin: float


def make_decomp_2d(
    floes: FloeState,
    domain: Domain,
    n_dev=(2, 2),
    local_cap: Optional[int] = None,
    halo_cap: Optional[int] = None,
    mig_cap: Optional[int] = None,
    margin: Optional[float] = None,
) -> Decomp2D:
    from ..core.domain import NORTH, SOUTH

    Dx, Dy = n_dev
    devs = jax.devices()
    if len(devs) < Dx * Dy:
        raise ValueError(f"need {Dx * Dy} devices, have {len(devs)}")
    mesh = Mesh(
        np.array(devs[: Dx * Dy]).reshape(Dx, Dy), axis_names=("x", "y")
    )
    act = np.asarray(floes.active)
    cx = np.asarray(floes.centroid[:, 0])[act]
    cy = np.asarray(floes.centroid[:, 1])[act]
    rmax = np.asarray(floes.rmax)[act]
    vals = np.asarray(domain.vals, float)
    w, e = vals[WEST], vals[EAST]
    s, n = vals[SOUTH], vals[NORTH]
    slab_x = (e - w) / Dx
    slab_y = (n - s) / Dy
    if margin is None:
        margin = float(2.2 * rmax.max()) if rmax.size else min(slab_x, slab_y) / 4
        # clamp the default so tiny pools work on any mesh (see make_decomp)
        margin = min(margin, float(min(slab_x, slab_y)))
    if margin > min(slab_x, slab_y):
        raise ValueError(
            f"halo margin {margin:.3g} exceeds slab size "
            f"({slab_x:.3g} x {slab_y:.3g}); use fewer devices or smaller floes"
        )
    ix = np.clip(((cx - w) / slab_x).astype(int), 0, Dx - 1)
    iy = np.clip(((cy - s) / slab_y).astype(int), 0, Dy - 1)
    occ = np.bincount(ix * Dy + iy, minlength=Dx * Dy)
    if local_cap is None:
        local_cap = int(max(2 * occ.max() + 8, 16))
    if halo_cap is None:
        near = 0
        for d in range(Dx * Dy):
            lo_x = w + (d // Dy) * slab_x
            lo_y = s + (d % Dy) * slab_y
            m = (ix * Dy + iy == d) & (
                (cx - rmax < lo_x + margin)
                | (cx + rmax > lo_x + slab_x - margin)
                | (cy - rmax < lo_y + margin)
                | (cy + rmax > lo_y + slab_y - margin)
            )
            near = max(near, int(m.sum()))
        halo_cap = int(max(2 * near + 8, 8))
    if mig_cap is None:
        mig_cap = int(max(local_cap // 8, 8))
    return Decomp2D(
        mesh=mesh, dx_dev=Dx, dy_dev=Dy, local_cap=local_cap,
        halo_cap=halo_cap, mig_cap=mig_cap, margin=float(margin),
    )


def distribute_2d(floes: FloeState, domain: Domain, dec: Decomp2D, extra=None):
    """Partition a global pool into per-(x,y)-slab local pools: row block
    (ix * Dy + iy) * local_cap holds slab (ix, iy).  ``extra``: see
    ``distribute``."""
    from ..core.domain import NORTH, SOUTH

    Dx, Dy, Nl = dec.dx_dev, dec.dy_dev, dec.local_cap
    act = np.asarray(floes.active)
    vals = np.asarray(domain.vals, float)
    w, e = vals[WEST], vals[EAST]
    s, n = vals[SOUTH], vals[NORTH]
    slab_x = (e - w) / Dx
    slab_y = (n - s) / Dy
    cx = np.asarray(floes.centroid[:, 0])
    cy = np.asarray(floes.centroid[:, 1])
    ix = np.clip(((cx - w) / slab_x).astype(int), 0, Dx - 1)
    iy = np.clip(((cy - s) / slab_y).astype(int), 0, Dy - 1)
    slab = ix * Dy + iy

    def place(a):
        a = np.asarray(a)
        out = np.zeros((Dx * Dy * Nl,) + a.shape[1:], a.dtype)
        for d in range(Dx * Dy):
            rows = np.flatnonzero(act & (slab == d))
            if rows.size > Nl:
                raise ValueError(
                    f"slab {d} holds {rows.size} floes > local_cap {Nl}"
                )
            out[d * Nl : d * Nl + rows.size] = a[rows]
        return out  # host numpy; see distribute()

    stacked = jax.tree.map(place, floes)
    sharding = NamedSharding(dec.mesh, P(("x", "y")))
    out = jax.tree.map(lambda a: jax.device_put(a, sharding), stacked)
    if extra is None:
        return out
    extra_out = jax.tree.map(
        lambda a: jax.device_put(place(a), sharding), extra
    )
    return out, extra_out


def build_decomp_step_2d(sim, dec: Decomp2D):
    """Compile one distributed step over a 2-D (x, y) slab mesh (same
    contract as build_decomp_step)."""
    return build_decomp_step(sim, dec)


def _make_parts_2d(sim, dec: Decomp2D, row_cap=None):
    """collide/finish SPMD halves of the 2-D (x, y) slab step.

    Same pipeline as the 1-D _make_parts_1d; halo exchange and migration
    run in two axis passes (x then y over the x-extended pool), which
    covers corner-diagonal neighbors with 4 ppermutes.
    """
    from ..core.domain import NORTH, SOUTH

    grid = sim.model.grid
    atmos = sim.model.atmos
    consts = sim.consts
    dt = float(sim.dt)
    fs = sim.floe_settings
    cps = sim.coupling_settings
    cls = sim.collision_settings
    Dx, Dy = dec.dx_dev, dec.dy_dev
    Nl = dec.local_cap
    H = dec.halo_cap
    Hm = dec.mig_cap
    ext_cap = Nl + 4 * H
    # see _make_parts_1d: row_cap snapshots the USER pool's per-floe budget
    if row_cap is None:
        row_cap = max(sim.pair_cap // max(sim.model.floes.capacity, 1), 8)
    # only the Nl local rows consume candidate budget (owned_rows prunes
    # halo rows from the broad phase).  Seam rows own their full halo
    # contact degree instead of the parity-halved share; the second-chance
    # spill list (_extra_cap) absorbs those few deep rows, so the global
    # budget stays at the single-device row_cap * pool size.
    pair_cap = max(row_cap * Nl, 256)

    def perms(D, wrap):
        if COMM_IDENTITY:  # timing diagnostic: same shapes, no data motion
            ident = [(d, d) for d in range(D)]
            return ident, ident
        fwd = [(d, (d + 1) % D) for d in range(D if wrap else D - 1)]
        bwd = [((d + 1) % D, d) for d in range(D if wrap else D - 1)]
        return fwd, bwd

    def pshuffle(tree, axis, perm):
        return jax.tree.map(lambda a: jax.lax.ppermute(a, axis, perm), tree)

    def halo_axis(floes, axis, D, me, lo, hi, Lax, wrap, coord, margin):
        """Exchange edge floes along one mesh axis; returns two packed
        dicts (from the lower neighbor, from the upper neighbor) and an
        overflow flag."""
        c = floes.centroid[:, coord]
        r = floes.rmax
        send_lo = floes.active & (c - r < lo + margin)
        send_hi = floes.active & (c + r > hi - margin)
        pk_lo, ov1 = _pack(floes, send_lo, H, _HALO_FIELDS)
        pk_hi, ov2 = _pack(floes, send_hi, H, _HALO_FIELDS)
        fwd, bwd = perms(D, wrap)
        recv_from_hi = pshuffle(pk_lo, axis, bwd)
        recv_from_lo = pshuffle(pk_hi, axis, fwd)
        if COMM_IDENTITY:
            # identity-perm diagnostic: deactivate self-copied halos (see
            # the 1-D variant) - shapes and padded compute stay production
            recv_from_hi = dict(
                recv_from_hi, active=jnp.zeros_like(recv_from_hi["active"])
            )
            recv_from_lo = dict(
                recv_from_lo, active=jnp.zeros_like(recv_from_lo["active"])
            )
        if wrap:
            sl = jnp.where(me == 0, -Lax, 0.0)
            sh = jnp.where(me == D - 1, Lax, 0.0)
            if coord == 0:
                recv_from_lo = _shift_xy(recv_from_lo, sl, 0.0)
                recv_from_hi = _shift_xy(recv_from_hi, sh, 0.0)
            else:
                recv_from_lo = _shift_xy(recv_from_lo, 0.0, sl)
                recv_from_hi = _shift_xy(recv_from_hi, 0.0, sh)
        return recv_from_lo, recv_from_hi, ov1 | ov2

    def migrate_axis(floes, axis, D, me, origin, slab_w, coord, wrap, overflow):
        """Move floes whose centroid left this axis's slab to the owner."""
        if D == 1:
            return floes, overflow
        c = floes.centroid[:, coord]
        dest = jnp.clip(
            jnp.floor((c - origin) / slab_w).astype(jnp.int32), 0, D - 1
        )
        hop = jnp.mod(dest - me, D)
        go_up = floes.active & (hop >= 1) & (hop <= D // 2)
        go_dn = floes.active & (dest != me) & ~go_up
        mig_fields = floes._fields
        mg_up, ov1 = _pack(floes, go_up, Hm, mig_fields)
        mg_dn, ov2 = _pack(floes, go_dn, Hm, mig_fields)
        overflow = overflow | ov1 | ov2
        floes = floes._replace(active=floes.active & ~(go_up | go_dn))
        fwd, bwd = perms(D, wrap)
        recv_hi = pshuffle(mg_dn, axis, bwd)   # from upper neighbor
        recv_lo = pshuffle(mg_up, axis, fwd)   # from lower neighbor
        free = ~floes.active
        (fidx,) = jnp.nonzero(free, size=2 * Hm, fill_value=Nl)
        for k, recv in enumerate((recv_lo, recv_hi)):
            slots = fidx[k * Hm : (k + 1) * Hm]
            ok = recv["active"] & (slots < Nl)
            overflow = overflow | jnp.any(recv["active"] & (slots >= Nl))
            idx = jnp.where(ok, slots, Nl)
            floes = floes._replace(**{
                f: getattr(floes, f).at[idx].set(recv[f], mode="drop")
                for f in mig_fields
            })
            floes = floes._replace(
                active=floes.active.at[idx].set(ok, mode="drop")
            )
        return floes, overflow

    def collide_local(floes, ocean, domain: Domain, tstep):
        me_x = jax.lax.axis_index("x")
        me_y = jax.lax.axis_index("y")
        vals = domain.vals
        w_val, e_val = vals[WEST], vals[EAST]
        s_val, n_val = vals[SOUTH], vals[NORTH]
        Lx = e_val - w_val
        Ly = n_val - s_val
        slab_x = Lx / Dx
        slab_y = Ly / Dy
        lo_x = w_val + me_x.astype(Lx.dtype) * slab_x
        lo_y = s_val + me_y.astype(Ly.dtype) * slab_y
        overflow = jnp.asarray(False)

        # ---- halo exchange: x, then y over the x-extended pool ----------
        # (1-slab axes skip their pass: min-image shifts cover wrap)
        if Dx == 1:
            ext_x = floes
        else:
            rl, rh, ov = halo_axis(
                floes, "x", Dx, me_x, lo_x, lo_x + slab_x, Lx,
                domain.ew_periodic, 0, dec.margin,
            )
            overflow = overflow | ov
            ext_x = jax.tree.map(
                lambda a, b, c: jnp.concatenate([a, b, c], axis=0),
                floes,
                _as_halo_state(floes, rl, H),
                _as_halo_state(floes, rh, H),
            )
        if Dy == 1:
            ext = ext_x
        else:
            rd, ru, ov = halo_axis(
                ext_x, "y", Dy, me_y, lo_y, lo_y + slab_y, Ly,
                domain.ns_periodic, 1, dec.margin,
            )
            overflow = overflow | ov
            ext = jax.tree.map(
                lambda a, b, c: jnp.concatenate([a, b, c], axis=0),
                ext_x,
                _as_halo_state(floes, rd, H),
                _as_halo_state(floes, ru, H),
            )

        # ---- collisions on the extended pool -----------------------------
        stress_instant = jnp.zeros_like(floes.stress_accum)
        if cls.collisions_on:
            res = _collisions.timestep_collisions(
                ext, domain, consts, dt, cls, pair_cap, sim.clip_cap, None,
                owned_rows=Nl,
            )
            loc = jax.tree.map(lambda a: a[:Nl], res.floes)
            floes = floes._replace(
                collision_force=loc.collision_force,
                collision_trq=loc.collision_trq,
                overarea=loc.overarea,
                remove=loc.remove,
                fuse_with=_fuse_with_to_ids(loc.fuse_with, ext),
            )
            stress_instant = res.stress_instant[:Nl]
            overflow = overflow | res.overflow
        domain = domain.update_boundaries(dt)
        overflow = (
            jax.lax.psum(overflow.astype(jnp.int32), ("x", "y")) > 0
        )
        return floes, domain, stress_instant, overflow

    def finish_local(floes, ocean, domain: Domain, stress_instant, tstep):
        me_x = jax.lax.axis_index("x")
        me_y = jax.lax.axis_index("y")
        vals = domain.vals
        w_val, e_val = vals[WEST], vals[EAST]
        s_val, n_val = vals[SOUTH], vals[NORTH]
        slab_x = (e_val - w_val) / Dx
        slab_y = (n_val - s_val) / Dy
        overflow = jnp.asarray(False)

        # ---- coupling (psum over both axes) -------------------------------
        if cps.coupling_on:
            def do_coupling(args):
                floes_, ocean_ = args
                return _coupling.timestep_coupling(
                    floes_, grid, domain, ocean_, atmos, consts, cps, fs,
                    dt, sim.cell_cap, axis_name=("x", "y"),
                )

            def skip_coupling(args):
                floes_, ocean_ = args
                if cps.two_way_coupling_on:
                    zero = jax.lax.psum(
                        jnp.zeros((), ocean_.tau_x.dtype), ("x", "y")
                    )
                    ocean_ = ocean_._replace(tau_x=ocean_.tau_x + zero)
                return floes_, ocean_, jnp.asarray(False)

            floes, ocean, cp_overflow = jax.lax.cond(
                jnp.mod(tstep, cps.dt) == 0, do_coupling, skip_coupling,
                (floes, ocean),
            )
            overflow = overflow | cp_overflow

        # ---- integrate + wrap + removal -----------------------------------
        floes = _update_floe.timestep_floe_properties(
            floes, dt, fs, stress_instant
        )
        floes = _update_floe.wrap_periodic(floes, domain)
        diss0 = ocean.dissolved
        floes, ocean = _simplification.remove_and_dissolve(
            floes, ocean, grid, domain, fs
        )
        ocean = ocean._replace(
            dissolved=diss0
            + jax.lax.psum(ocean.dissolved - diss0, ("x", "y"))
        )

        # ---- migration: x pass then y pass --------------------------------
        floes, overflow = migrate_axis(
            floes, "x", Dx, me_x, w_val, slab_x, 0, domain.ew_periodic,
            overflow,
        )
        floes, overflow = migrate_axis(
            floes, "y", Dy, me_y, s_val, slab_y, 1, domain.ns_periodic,
            overflow,
        )

        overflow = jax.lax.psum(overflow.astype(jnp.int32), ("x", "y")) > 0
        return floes, ocean, domain, overflow

    return collide_local, finish_local
