"""Shared helpers for the example scripts."""

import numpy as np
import jax.numpy as jnp


def modulus_from_floes(floes):
    """The examples' Young's modulus convention:
    E = 1.5e3 * (mean(sqrt(area)) + min(sqrt(area)))
    (e.g. /root/reference/examples/uniform_flow.jl:38)."""
    area = np.asarray(floes.area)[np.asarray(floes.active)]
    return float(1.5e3 * (np.mean(np.sqrt(area)) + np.min(np.sqrt(area))))
