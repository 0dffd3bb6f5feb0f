from .conservation import drift_percent, floe_energy_momentum  # noqa: F401
