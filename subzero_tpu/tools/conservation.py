"""Energy / momentum conservation diagnostics.

Mirrors the reference's conservation checker
(/root/reference/src/tools/conservation_em.jl:16-151): kinetic energy,
linear momentum, and angular momentum (spin + orbital) of the floe field,
for use as a time series over a simulation.
"""

from __future__ import annotations

import jax.numpy as jnp


def floe_energy_momentum(floes):
    """Returns dict of totals over active floes:
    kinetic energy, linear momentum (x, y), angular momentum (spin+orbital).
    """
    m = jnp.where(floes.active, floes.mass, 0.0)
    moment = jnp.where(floes.active, floes.moment, 0.0)
    u, v, xi = floes.u, floes.v, floes.xi
    x = floes.centroid[:, 0]
    y = floes.centroid[:, 1]
    ke = 0.5 * jnp.sum(m * (u * u + v * v)) + 0.5 * jnp.sum(moment * xi * xi)
    px = jnp.sum(m * u)
    py = jnp.sum(m * v)
    l_spin = jnp.sum(moment * xi)
    l_orb = jnp.sum(m * (x * v - y * u))
    return {
        "ke": ke,
        "px": px,
        "py": py,
        "l": l_spin + l_orb,
    }


def drift_percent(series):
    """Percent change from first to last value for each tracked quantity.

    series: dict of 1-D arrays (time series). Matches the reference's
    conservation_simulation summary (test_conservation.jl:50-56); returns
    NaN where the initial value is zero.
    """
    out = {}
    for k, vals in series.items():
        first = vals[0]
        last = vals[-1]
        out[k] = jnp.where(
            first != 0, (last - first) / first * 100.0, jnp.nan
        )
    return out
