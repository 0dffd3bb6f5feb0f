"""Device-side floe-pool maintenance: removal and dissolution.

The masking part of the reference's simplify_floes! pipeline
(/root/reference/src/physical_processes/simplification.jl:279-378): floes
marked ``remove`` are deactivated; floes below the minimum area or height are
dissolved into the ocean's ``dissolved`` field at their centroid cell.
(Smoothing and fusing are host passes - see lifecycle_host.py.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.domain import Domain
from ..core.fields import OceanState
from ..core.floes import FloeState
from ..core.grid import RegRectilinearGrid
from ..settings import FloeSettings


def remove_and_dissolve(
    floes: FloeState,
    ocean: OceanState,
    grid: RegRectilinearGrid,
    domain: Domain,
    floe_settings: FloeSettings,
):
    """remove_floes! (simplification.jl:279-314), batched.

    Returns (floes, ocean) with dissolved mass accumulated.
    """
    act = floes.active
    dissolve = act & ~floes.remove & (
        (floes.area < floe_settings.min_floe_area)
        | (floes.height < floe_settings.min_floe_height)
    )
    # dissolved mass scattered to the grid cell under the centroid
    # (dissolve_floe!, simplification.jl:18-32)
    cx = jnp.floor((floes.centroid[:, 0] - grid.x0) / grid.dx).astype(jnp.int32)
    cy = jnp.floor((floes.centroid[:, 1] - grid.y0) / grid.dy).astype(jnp.int32)
    if domain.ew_periodic:
        cx = jnp.mod(cx, grid.Nx)
    if domain.ns_periodic:
        cy = jnp.mod(cy, grid.Ny)
    in_grid = (cx >= 0) & (cx < grid.Nx) & (cy >= 0) & (cy < grid.Ny)
    NCy = grid.Ny + 1
    ncells = (grid.Nx + 1) * NCy
    N = floes.capacity
    # Dissolution is rare: compact the dissolving floes to a small fixed
    # list before the one-hot deposition contraction (a full [N, ncells]
    # one-hot is ~1.3 GB/step at N = 8k on a 201x201 grid; TPU scatters
    # serialize, hence the one-hot).  If more than K floes dissolve in one
    # step, the unselected ones simply stay active and dissolve next step -
    # the mass ledger stays exact.
    K = min(256, N)
    rank = jnp.cumsum(dissolve.astype(jnp.int32)) - 1
    selected = dissolve & (rank < K)
    (sel,) = jnp.nonzero(dissolve, size=K, fill_value=N)
    valid = sel < N
    safe = jnp.minimum(sel, N - 1)
    cellk = jnp.where(
        valid & in_grid[safe], cx[safe] * NCy + cy[safe], ncells
    )
    onehot = (
        cellk[:, None] == jnp.arange(ncells, dtype=cellk.dtype)[None, :]
    ).astype(floes.mass.dtype)
    massk = jnp.where(valid & in_grid[safe], floes.mass[safe], 0.0)
    added = jax.lax.dot_general(
        onehot, massk, (((0,), (0,)), ((), ())),
        preferred_element_type=floes.mass.dtype,
    ).reshape(grid.Nx + 1, NCy)
    ocean = ocean._replace(dissolved=ocean.dissolved + added.astype(ocean.dissolved.dtype))

    gone = floes.remove | selected
    new_active = act & ~gone
    # NOTE: fuse_with is NOT reset here - the host fusion pass after the
    # device step consumes it (and resets it itself); removed floes can't
    # fuse anymore, so just mask their flags
    floes = floes._replace(
        active=new_active,
        remove=jnp.zeros_like(floes.remove),
        fuse_with=jnp.where(new_active, floes.fuse_with, -1),
    )
    return floes, ocean
