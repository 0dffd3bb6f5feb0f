"""Ocean and atmosphere state.

Mirrors the reference ``Ocean`` / ``Atmos``
(/root/reference/src/simulation_components/oceans.jl, atmos.jl): prescribed
velocity/temperature fields on grid points ``[Nx+1, Ny+1]`` (indexed
``[ix, iy]``), plus the two-way-coupling outputs (stress on the ocean,
sea-ice fraction, heatflux factor) and the dissolved-mass accumulator.

The reference's per-cell stress lists (``CellStresses``) are replaced by
dense per-cell accumulators filled with segment-sums in coupling.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .grid import RegRectilinearGrid


class OceanState(NamedTuple):
    u: jnp.ndarray            # [Nx+1, Ny+1]
    v: jnp.ndarray
    temp: jnp.ndarray
    hflx_factor: jnp.ndarray
    tau_x: jnp.ndarray        # stress on ocean from ice/atmos (2-way)
    tau_y: jnp.ndarray
    si_frac: jnp.ndarray      # sea-ice area fraction per (line-centered) cell
    dissolved: jnp.ndarray    # mass dissolved into each cell


class AtmosState(NamedTuple):
    u: jnp.ndarray            # [Nx+1, Ny+1]
    v: jnp.ndarray
    temp: jnp.ndarray


def _field(val, shape, dtype):
    arr = np.asarray(val, dtype=np.float64)
    if arr.ndim == 0:
        arr = np.full(shape, float(arr))
    if arr.shape != shape:
        raise ValueError(f"field shape {arr.shape} != grid point shape {shape}")
    return jnp.asarray(arr, dtype=dtype)


def make_ocean(grid: RegRectilinearGrid, u=0.0, v=0.0, temp=0.0, dtype=jnp.float32):
    """Ocean constructor (oceans.jl:207-222). Scalars broadcast to fields."""
    shape = (grid.Nx + 1, grid.Ny + 1)
    z = jnp.zeros(shape, dtype=dtype)
    t = _field(temp, shape, dtype)
    if bool(jnp.any((t < -3) | (t > 0))):
        import warnings

        warnings.warn(
            "Ocean temperatures outside the range [-3, 0] may give unrealistic "
            "freezing behavior"
        )
    return OceanState(
        u=_field(u, shape, dtype),
        v=_field(v, shape, dtype),
        temp=t,
        hflx_factor=z,
        tau_x=z,
        tau_y=z,
        si_frac=z,
        dissolved=z,
    )


def make_atmos(grid: RegRectilinearGrid, u=0.0, v=0.0, temp=0.0, dtype=jnp.float32):
    """Atmos constructor (atmos.jl:108-114)."""
    shape = (grid.Nx + 1, grid.Ny + 1)
    return AtmosState(
        u=_field(u, shape, dtype),
        v=_field(v, shape, dtype),
        temp=_field(temp, shape, dtype),
    )
