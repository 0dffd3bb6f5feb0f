from .grid import RegRectilinearGrid, make_grid  # noqa: F401
from .fields import AtmosState, OceanState, make_atmos, make_ocean  # noqa: F401
from .domain import (  # noqa: F401
    BoundaryKind,
    Domain,
    NORTH,
    SOUTH,
    EAST,
    WEST,
    TopographyField,
    empty_topography,
    make_domain,
    make_topography,
)
from .floes import FloeState, build_floes, empty_floes  # noqa: F401
from .init import initialize_floe_field, initialize_floe_field_coords  # noqa: F401
from .model import Model, make_model  # noqa: F401
