from .polygon import (  # noqa: F401
    close_ring,
    ensure_ccw,
    interior_angles,
    max_radius,
    pad_polygon,
    point_in_polygon,
    poly_area,
    poly_bounds,
    poly_centroid,
    poly_moment_inertia,
    rotate_about,
    signed_area,
)
from .clip import ClipRegions, intersect_area, intersect_regions  # noqa: F401
