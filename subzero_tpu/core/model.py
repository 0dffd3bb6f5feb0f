"""Model container: grid + ocean + atmos + domain + floes.

Mirrors the reference ``Model``
(/root/reference/src/simulation_components/model.jl:47-119) including its
validation (domain within grid, matching field sizes, temperature sanity).
The grid is static config; ocean/atmos/domain/floes are traced pytrees.
"""

from __future__ import annotations

import dataclasses
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from .domain import Domain, EAST, NORTH, SOUTH, WEST
from .fields import AtmosState, OceanState
from .floes import FloeState
from .grid import RegRectilinearGrid


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Model:
    grid: RegRectilinearGrid = dataclasses.field(metadata=dict(static=True))
    ocean: OceanState = None
    atmos: AtmosState = None
    domain: Domain = None
    floes: FloeState = None

    def replace(self, **kw) -> "Model":
        return dataclasses.replace(self, **kw)


def make_model(
    grid: RegRectilinearGrid,
    ocean: OceanState,
    atmos: AtmosState,
    domain: Domain,
    floes: FloeState,
) -> Model:
    # domain_in_grid validation (model.jl:16-36)
    vals = np.asarray(domain.vals, float)
    if not (
        vals[NORTH] <= grid.yf
        and vals[SOUTH] >= grid.y0
        and vals[EAST] <= grid.xf
        and vals[WEST] >= grid.x0
        and vals[NORTH] > vals[SOUTH]
        and vals[EAST] > vals[WEST]
    ):
        raise ValueError("domain does not fit within grid")
    if ocean.u.shape != atmos.u.shape:
        raise ValueError("ocean and atmos field sizes must match")
    expected = (grid.Nx + 1, grid.Ny + 1)
    if tuple(ocean.u.shape) != expected:
        raise ValueError(f"ocean fields {ocean.u.shape} != grid points {expected}")
    if bool(jnp.any(atmos.temp > ocean.temp)):
        warnings.warn(
            "atmosphere temperature above ocean temperature over part of the "
            "grid; ice may melt unexpectedly"
        )
    return Model(grid=grid, ocean=ocean, atmos=atmos, domain=domain, floes=floes)
