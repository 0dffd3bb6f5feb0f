from . import (  # noqa: F401
    collisions,
    coupling,
    lifecycle_host,
    simplification,
    update_floe,
)
