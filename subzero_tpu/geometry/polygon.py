"""Batched fixed-shape polygon primitives for TPU.

All polygons are stored as padded vertex rings: an array ``v`` of shape
``[..., V, 2]`` together with an integer vertex count ``n`` (``n <= V``).
Rings are *open* (the closing edge ``v[n-1] -> v[0]`` is implicit) and are
oriented counter-clockwise (CCW).  Padding slots ``v[n:]`` must repeat the
last valid vertex so that spurious edges are degenerate (zero length) and
contribute nothing to any line integral; every function here additionally
masks on ``n`` so padding content is actually irrelevant.

These primitives replace the GeometryOps.jl geometry kernel used by the
reference (Subzero.jl) - see ``/root/reference/src/floe_utils.jl`` for the
scalar originals:
  * ``poly_area`` / ``poly_centroid``  - GO.area / GO.centroid
  * ``poly_moment_inertia``            - ``floe_utils.jl:273-298``
  * ``max_radius``                     - ``floe_utils.jl:301-313``
  * ``interior_angles``                - GO.angles
  * ``point_in_polygon``               - GO.coveredby

Everything is written shape-static so it can be ``jax.vmap``-ed and compiled
once by XLA for the TPU's vector unit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "close_ring",
    "edge_mask",
    "poly_edges",
    "poly_area",
    "signed_area",
    "poly_centroid",
    "poly_moment_inertia",
    "max_radius",
    "interior_angles",
    "point_in_polygon",
    "points_in_polygon",
    "ensure_ccw",
    "pad_polygon",
    "rotate_about",
    "poly_bounds",
]


def edge_mask(n, V):
    """Boolean [V] mask of valid edges for a ring with n vertices."""
    idx = jnp.arange(V)
    return idx < n


def close_ring(v, n):
    """Return per-edge endpoints (a, b) for the closed ring.

    ``a[i] = v[i]``, ``b[i] = v[(i+1) % n]`` for valid ``i < n``; padded edges
    are collapsed onto the last valid vertex (degenerate).
    """
    V = v.shape[-2]
    idx = jnp.arange(V)
    # For i >= n, both endpoints clamp to last valid vertex.
    last = jnp.maximum(n - 1, 0)
    cur = jnp.minimum(idx, last)
    nxt = jnp.where(idx < n, jnp.where(idx == n - 1, 0, jnp.minimum(idx + 1, last)), last)
    a = jnp.take(v, cur, axis=-2)
    b = jnp.take(v, nxt, axis=-2)
    return a, b


def poly_edges(v, n):
    """Alias of close_ring for readability."""
    return close_ring(v, n)


def signed_area(v, n):
    """Signed area via the shoelace formula (CCW positive)."""
    a, b = close_ring(v, n)
    cross = a[..., 0] * b[..., 1] - b[..., 0] * a[..., 1]
    m = edge_mask(n, v.shape[-2])
    return 0.5 * jnp.sum(jnp.where(m, cross, 0.0), axis=-1)


def poly_area(v, n):
    return jnp.abs(signed_area(v, n))


def poly_centroid(v, n):
    """Area centroid of the polygon (assumes CCW non-degenerate)."""
    a, b = close_ring(v, n)
    cross = a[..., 0] * b[..., 1] - b[..., 0] * a[..., 1]
    m = edge_mask(n, v.shape[-2])
    cross = jnp.where(m, cross, 0.0)
    A = 0.5 * jnp.sum(cross, axis=-1)
    cx = jnp.sum((a[..., 0] + b[..., 0]) * cross, axis=-1) / (6.0 * A)
    cy = jnp.sum((a[..., 1] + b[..., 1]) * cross, axis=-1) / (6.0 * A)
    return jnp.stack([cx, cy], axis=-1)


def poly_moment_inertia(v, n, centroid, height, rho_i=920.0):
    """Mass moment of inertia about the centroid (out-of-plane axis).

    Mirrors the reference's ``_calc_moment_inertia`` (floe_utils.jl:273-298),
    which follows Marin (1984): with vertices shifted to the centroid,

        w_i  = x_i * y_{i+1} - x_{i+1} * y_i
        Ixx  = 1/12 sum w_i (y_i^2 + y_i y_{i+1} + y_{i+1}^2)
        Iyy  = 1/12 sum w_i (x_i^2 + x_i x_{i+1} + x_{i+1}^2)
        I    = |Ixx + Iyy| * height * rho_i

    Note: the reference subtracts the centroid from each point *and then*
    subtracts it again inside ``w_i``; we reproduce the standard (correct)
    formula used there in effect. The reference computes, for points already
    shifted by the centroid, ``wi = (x1 - xc)*(y2 - yc) - (x2 - xc)*(y1 - yc)``
    - i.e. it shifts twice. We replicate that faithfully for parity.
    """
    c = centroid
    a, b = close_ring(v, n)
    # first shift (as the reference does before the loop)
    x1, y1 = a[..., 0] - c[..., 0:1], a[..., 1] - c[..., 1:2]
    x2, y2 = b[..., 0] - c[..., 0:1], b[..., 1] - c[..., 1:2]
    # the reference's double-shift: wi uses coordinates shifted again by c
    xc, yc = c[..., 0:1], c[..., 1:2]
    w = (x1 - xc) * (y2 - yc) - (x2 - xc) * (y1 - yc)
    m = edge_mask(n, v.shape[-2])
    w = jnp.where(m, w, 0.0)
    Ixx = jnp.sum(w * (y1 * y1 + y1 * y2 + y2 * y2), axis=-1) / 12.0
    Iyy = jnp.sum(w * (x1 * x1 + x1 * x2 + x2 * x2), axis=-1) / 12.0
    return jnp.abs(Ixx + Iyy) * height * rho_i


def max_radius(v, n, centroid):
    """Distance from centroid to the farthest valid vertex."""
    d2 = jnp.sum((v - centroid[..., None, :]) ** 2, axis=-1)
    m = edge_mask(n, v.shape[-2])
    d2 = jnp.where(m, d2, -jnp.inf)
    return jnp.sqrt(jnp.max(d2, axis=-1))


def interior_angles(v, n):
    """Interior angles (degrees) at each valid vertex; padded slots = 0."""
    V = v.shape[-2]
    idx = jnp.arange(V)
    last = jnp.maximum(n - 1, 0)
    prv = jnp.where(idx == 0, last, jnp.minimum(idx - 1, last))
    nxt = jnp.where(idx >= n - 1, 0, idx + 1)
    p0 = jnp.take(v, prv, axis=-2)
    p1 = v
    p2 = jnp.take(v, jnp.minimum(nxt, last), axis=-2)
    u = p0 - p1
    w = p2 - p1
    dot = jnp.sum(u * w, axis=-1)
    crs = u[..., 0] * w[..., 1] - u[..., 1] * w[..., 0]
    ang = jnp.arctan2(jnp.abs(crs), dot)
    # reflex correction: interior is on the left for CCW; if cross(w, u) < 0
    # the interior angle is > pi
    ang = jnp.where(crs > 0, 2.0 * jnp.pi - ang, ang)
    m = edge_mask(n, V)
    return jnp.where(m, jnp.degrees(ang), 0.0)


def point_in_polygon(p, v, n, include_boundary=True):
    """Crossing-number test of point(s) p [...,2] against one padded ring.

    Uses the even/odd rule on a ray in +x. Points exactly on an edge are
    classified by ``include_boundary``(approximately; exact-on-edge handling
    uses a small relative tolerance).
    """
    a, b = close_ring(v, n)
    m = edge_mask(n, v.shape[-2])
    px = p[..., None, 0]
    py = p[..., None, 1]
    ax, ay = a[..., 0], a[..., 1]
    bx, by = b[..., 0], b[..., 1]
    cond = (ay > py) != (by > py)
    # x coordinate of edge at height py
    t = (py - ay) / jnp.where(by == ay, 1.0, by - ay)
    xint = ax + t * (bx - ax)
    crossings = jnp.sum(jnp.where(cond & m & (px < xint), 1, 0), axis=-1)
    inside = (crossings % 2) == 1
    if include_boundary:
        # on-edge check: |cross| small and within segment bbox
        dx, dy = bx - ax, by - ay
        crs = (px - ax) * dy - (py - ay) * dx
        seg_len2 = dx * dx + dy * dy
        scale = jnp.sqrt(jnp.maximum(seg_len2, 1e-30))
        dot = (px - ax) * dx + (py - ay) * dy
        on_edge = (jnp.abs(crs) <= 1e-9 * jnp.maximum(scale, 1.0) * scale) & (
            dot >= -1e-9 * seg_len2
        ) & (dot <= seg_len2 * (1 + 1e-9))
        inside = inside | jnp.any(on_edge & m, axis=-1)
    return inside


def points_in_polygon(pts, v, n, include_boundary=True):
    """Vectorized point_in_polygon over leading axes of pts [...,2]."""
    return point_in_polygon(pts, v, n, include_boundary)


def ensure_ccw(v, n):
    """Reverse the ring if it is clockwise. Returns new padded ring."""
    V = v.shape[-2]
    s = signed_area(v, n)
    idx = jnp.arange(V)
    rev = jnp.where(idx < n, (n - 1 - idx) % jnp.maximum(n, 1), jnp.maximum(n - 1, 0))
    v_rev = jnp.take(v, rev, axis=-2)
    return jnp.where((s < 0)[..., None, None], v_rev, v)


def pad_polygon(coords, V, dtype=jnp.float64):
    """Host helper: list/array of [n,2] -> (padded [V,2], n).

    Drops a repeated closing vertex if present. Pads by repeating the last
    vertex.
    """
    import numpy as np

    c = np.asarray(coords, dtype=np.float64)
    if c.ndim != 2 or c.shape[-1] != 2:
        raise ValueError(f"expected [n,2] coords, got {c.shape}")
    if len(c) > 1 and np.allclose(c[0], c[-1]):
        c = c[:-1]
    # drop duplicate adjacent vertices (valid_ringvec! analog)
    keep = np.ones(len(c), dtype=bool)
    for i in range(1, len(c)):
        if np.allclose(c[i], c[i - 1]):
            keep[i] = False
    c = c[keep]
    n = len(c)
    if n > V:
        raise ValueError(f"polygon has {n} vertices > capacity {V}")
    if n < 3:
        raise ValueError("polygon needs at least 3 distinct vertices")
    pad = np.repeat(c[-1:], V - n, axis=0)
    out = np.concatenate([c, pad], axis=0)
    return jnp.asarray(out, dtype=dtype), jnp.asarray(n, dtype=jnp.int32)


def rotate_about(v, center, angle):
    """Rotate points v [..., 2] by angle about center [..., 2]."""
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    d = v - center[..., None, :]
    x = ca[..., None] * d[..., 0] - sa[..., None] * d[..., 1]
    y = sa[..., None] * d[..., 0] + ca[..., None] * d[..., 1]
    return jnp.stack([x, y], axis=-1) + center[..., None, :]


def poly_bounds(v, n):
    """(xmin, xmax, ymin, ymax) over valid vertices."""
    m = edge_mask(n, v.shape[-2])
    big = jnp.inf
    x = v[..., 0]
    y = v[..., 1]
    xmin = jnp.min(jnp.where(m, x, big), axis=-1)
    xmax = jnp.max(jnp.where(m, x, -big), axis=-1)
    ymin = jnp.min(jnp.where(m, y, big), axis=-1)
    ymax = jnp.max(jnp.where(m, y, -big), axis=-1)
    return xmin, xmax, ymin, ymax
