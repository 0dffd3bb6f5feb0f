from . import collisions, coupling, update_floe  # noqa: F401
