"""Domain: four directional boundaries + static topography.

Mirrors the reference's domain components
(/root/reference/src/simulation_components/domain_components/): each wall is
one of four behaviors -

  * OPEN       - floes touching it are removed (boundaries.jl:153-228)
  * PERIODIC   - floes wrap around (handled with minimum-image shifts in the
                 collision/coupling kernels rather than ghost-floe copies;
                 see physics/collisions.py) (boundaries.jl:240-315)
  * COLLISION  - immovable, unbreakable wall exerting contact forces
                 (boundaries.jl:327-403)
  * MOVING     - collision wall translating with (u, v), compressing or
                 shearing the domain (boundaries.jl:415-544)

Wall *kinds* are static (they determine compiled control flow); wall
*positions* (``vals``: [north, south, east, west] edge coordinates) are traced
state so MovingBoundary walls can advance under jit.

Topography elements (topography.jl) are static unbreakable polygonal
obstacles stored as padded rings.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import host_clip
from ..geometry.polygon import pad_polygon, poly_area, poly_centroid, max_radius
from .grid import RegRectilinearGrid


class BoundaryKind(enum.IntEnum):
    OPEN = 0
    PERIODIC = 1
    COLLISION = 2
    MOVING = 3


# directions index the vals array: [north, south, east, west], matching the
# reference's negative interaction indices -1..-4 (domains.jl:150-163)
NORTH, SOUTH, EAST, WEST = 0, 1, 2, 3


class TopographyField(NamedTuple):
    verts: jnp.ndarray     # [T, V, 2] padded CCW rings
    nverts: jnp.ndarray    # [T]
    centroid: jnp.ndarray  # [T, 2]
    rmax: jnp.ndarray      # [T]
    area: jnp.ndarray      # [T]

    @property
    def count(self) -> int:
        return self.verts.shape[0]


def make_topography(coords_list, V: int = 32, dtype=jnp.float32) -> TopographyField:
    """Build a topography field from polygon coordinate lists.

    De-intersects overlapping polygons (difference of later ones against
    earlier), as initialize_topography_field does (topography.jl:154-169).
    """
    polys: list[np.ndarray] = []
    for c in coords_list:
        c = np.asarray(c, dtype=float)
        if c.ndim == 3:  # PolyVec with ring nesting
            c = c[0]
        ring = host_clip._clean_ring(c)
        pieces = [ring]
        for prev in polys:
            nxt = []
            for p in pieces:
                nxt.extend(host_clip.difference(p, prev))
            pieces = nxt
        polys.extend(pieces)
    return topography_from_polys(polys, V=V, dtype=dtype)


def topography_from_polys(polys, V: int = 32, dtype=jnp.float32) -> TopographyField:
    T = len(polys)
    verts = np.zeros((T, V, 2))
    nverts = np.zeros((T,), np.int32)
    for i, p in enumerate(polys):
        v, n = pad_polygon(p, V, dtype=jnp.float64)
        verts[i] = np.asarray(v)
        nverts[i] = int(n)
    verts_j = jnp.asarray(verts, dtype=dtype)
    nverts_j = jnp.asarray(nverts)
    if T > 0:
        cent = jax.vmap(poly_centroid)(verts_j, nverts_j)
        rmax = jax.vmap(max_radius)(verts_j, nverts_j, cent)
        area = jax.vmap(poly_area)(verts_j, nverts_j)
    else:
        cent = jnp.zeros((0, 2), dtype)
        rmax = jnp.zeros((0,), dtype)
        area = jnp.zeros((0,), dtype)
    return TopographyField(verts=verts_j, nverts=nverts_j, centroid=cent, rmax=rmax, area=area)


def empty_topography(V: int = 32, dtype=jnp.float32) -> TopographyField:
    return topography_from_polys([], V=V, dtype=dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Domain:
    # static configuration
    kinds: Tuple[int, int, int, int] = dataclasses.field(
        metadata=dict(static=True)
    )  # BoundaryKind per [N, S, E, W]
    # dynamic state
    vals: jnp.ndarray = None          # [4] wall edge coordinate [N, S, E, W]
    velocities: jnp.ndarray = None    # [4, 2] (u, v) per wall (MOVING only)
    topography: TopographyField = None

    # -- derived helpers (static python) ------------------------------------
    @property
    def ns_periodic(self) -> bool:
        return (
            self.kinds[NORTH] == BoundaryKind.PERIODIC
            and self.kinds[SOUTH] == BoundaryKind.PERIODIC
        )

    @property
    def ew_periodic(self) -> bool:
        return (
            self.kinds[EAST] == BoundaryKind.PERIODIC
            and self.kinds[WEST] == BoundaryKind.PERIODIC
        )

    def update_boundaries(self, dt) -> "Domain":
        """Advance MOVING walls by their velocities (collisions.jl:565-571;
        boundaries.jl:526-544: N/S walls move by v, E/W walls by u)."""
        if not any(k == BoundaryKind.MOVING for k in self.kinds):
            return self
        comp = jnp.asarray([1, 1, 0, 0])  # N,S use v; E,W use u
        delta = jnp.take_along_axis(
            self.velocities, comp[:, None], axis=1
        )[:, 0] * dt
        moving = jnp.asarray(
            [k == BoundaryKind.MOVING for k in self.kinds]
        )
        return dataclasses.replace(
            self, vals=self.vals + jnp.where(moving, delta, 0.0)
        )


def make_domain(
    grid: RegRectilinearGrid,
    north: BoundaryKind,
    south: BoundaryKind,
    east: BoundaryKind,
    west: BoundaryKind,
    topography: TopographyField | None = None,
    velocities=None,
    dtype=jnp.float32,
    topo_V: int = 32,
) -> Domain:
    """Build a Domain; validates periodic pairing like the reference
    (domains.jl:19-31)."""
    for a, b, name in ((north, south, "north/south"), (east, west, "east/west")):
        if (a == BoundaryKind.PERIODIC) != (b == BoundaryKind.PERIODIC):
            raise ValueError(
                f"{name} boundary pair must both be periodic or both not"
            )
    vals = jnp.asarray([grid.yf, grid.y0, grid.xf, grid.x0], dtype=dtype)
    if velocities is None:
        vel = jnp.zeros((4, 2), dtype=dtype)
    else:
        vel = jnp.asarray(velocities, dtype=dtype)
    topo = topography if topography is not None else empty_topography(topo_V, dtype)
    return Domain(
        kinds=(int(north), int(south), int(east), int(west)),
        vals=vals,
        velocities=vel,
        topography=topo,
    )


def wall_rect(domain: Domain, which: int, V: int, dtype):
    """Padded rectangle polygon of one wall, rebuilt from current vals.

    Matches _boundary_info_from_extent (boundaries.jl:29-141): each wall is a
    half-domain-width overlapping rectangle just outside the domain edge.
    """
    n, s, e, w = (
        domain.vals[NORTH],
        domain.vals[SOUTH],
        domain.vals[EAST],
        domain.vals[WEST],
    )
    hx = (e - w) / 2
    hy = (n - s) / 2
    if which == NORTH:
        x0, x1, y0, y1 = w - hx, e + hx, n, n + hy
    elif which == SOUTH:
        x0, x1, y0, y1 = w - hx, e + hx, s - hy, s
    elif which == EAST:
        x0, x1, y0, y1 = e, e + hx, s - hy, n + hy
    else:
        x0, x1, y0, y1 = w - hx, w, s - hy, n + hy
    base = jnp.stack(
        [
            jnp.stack([x0, y0]),
            jnp.stack([x1, y0]),
            jnp.stack([x1, y1]),
            jnp.stack([x0, y1]),
        ]
    ).astype(dtype)
    pad = jnp.broadcast_to(base[3:4], (V - 4, 2))
    return jnp.concatenate([base, pad], axis=0), jnp.asarray(4, jnp.int32)
