"""Readers for reference-format (JLD2/HDF5) fixture files.

JLD2 files are HDF5 underneath; nested Julia `Vector{Vector{Vector{T}}}`
coordinates become chains of object references, which these helpers
flatten back into numpy rings.
"""

from __future__ import annotations

import h5py
import numpy as np

REFERENCE_FLOE_SHAPES = "/root/reference/examples/floe_shapes.jld2"


def _deref(f, ref):
    o = f[ref][()]
    if isinstance(o, np.ndarray) and o.dtype == object:
        return [_deref(f, r) for r in o.ravel()]
    return np.asarray(o)


def load_floe_shapes(path: str = REFERENCE_FLOE_SHAPES, max_verts: int | None = None):
    """Load floe outline rings from a JLD2 `floe_vertices` fixture.

    Returns a list of [n, 2] float arrays (exterior rings only, matching the
    reference's hole-stripping). ``max_verts`` optionally decimates rings to
    fit a vertex capacity.
    """
    out = []
    with h5py.File(path, "r") as f:
        refs = f["floe_vertices"][()]
        for ref in np.ravel(refs):
            shape = _deref(f, ref)
            ring = np.asarray(shape[0])
            ring = np.squeeze(ring)
            if ring.ndim != 2 or ring.shape[-1] != 2:
                continue
            if len(ring) > 1 and np.allclose(ring[0], ring[-1]):
                ring = ring[:-1]
            if max_verts is not None and len(ring) > max_verts:
                ring = _decimate(ring, max_verts)
            if len(ring) >= 3:
                out.append(ring)
    return out


def _decimate(ring, max_v):
    ring = [np.asarray(p) for p in ring]
    while len(ring) > max_v:
        n = len(ring)
        best, bestd = 0, np.inf
        for k in range(n):
            p0, p1, p2 = ring[k - 1], ring[k], ring[(k + 1) % n]
            seg = p2 - p0
            L = max(np.linalg.norm(seg), 1e-12)
            d = abs(seg[0] * (p1 - p0)[1] - seg[1] * (p1 - p0)[0]) / L
            if d < bestd:
                best, bestd = k, d
        ring.pop(best)
    return np.asarray(ring)
