"""Multi-device SPMD execution.

The scaling dimension of this workload is the floe pool (collisions,
coupling, integration are all per-floe or per-pair): pool arrays are sharded
along their leading axis over a 1-D device mesh, grid fields and domain
state are replicated, and XLA's SPMD partitioner inserts the collectives
for cross-shard collision pairs (the gathered j-side of each candidate
pair) and grid segment-sums.

This is the moral equivalent of the reference's `Threads.@threads` floe
loops + ghost-floe halo machinery (SURVEY §2.9), expressed as shardings
instead of threads: the per-floe fan-out maps to the mesh, and the
reduce-back of pair reactions maps to psum-style scatter-adds emitted by
the partitioner.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if len(devs) < n_devices:
        raise ValueError(f"need {n_devices} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_devices]), axis_names=(axis,))


def pad_pool(floes, multiple: int):
    """Pad the floe pool so its capacity divides the mesh size."""
    N = floes.capacity
    pad = (-N) % multiple
    if pad == 0:
        return floes
    return jax.tree.map(
        lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
        ),
        floes,
    )


def shard_state(floes, ocean, domain, mesh: Mesh, axis: str = "x"):
    """Place the floe pool sharded along the mesh; replicate grid/domain."""
    floes = pad_pool(floes, mesh.devices.size)

    def shard_floe_leaf(a):
        return jax.device_put(a, NamedSharding(mesh, P(axis)))

    def replicate(a):
        return jax.device_put(a, NamedSharding(mesh, P()))

    return (
        jax.tree.map(shard_floe_leaf, floes),
        jax.tree.map(replicate, ocean),
        jax.tree.map(replicate, domain),
    )


def sharded_step(sim, mesh: Mesh, axis: str = "x"):
    """Build the jitted step and sharded initial state for a mesh.

    Returns (step_fn, floes, ocean, domain). The step function is the same
    single-device program; sharding propagates from the inputs.
    """
    from ..simulation import build_step

    floes, ocean, domain = shard_state(
        sim.model.floes, sim.model.ocean, sim.model.domain, mesh, axis
    )
    if floes.capacity != sim.model.floes.capacity:
        sim.model = sim.model.replace(floes=floes)
        sim.pair_cap = max(8 * floes.capacity, 256)
    step = build_step(sim)
    return step, floes, ocean, domain


def measure_scaling(sim, n_steps: int = 20, axis: str = "x"):
    """Steps/s on 1 device vs all devices; returns dict with efficiency."""
    import time

    res = {}
    for ndev in (1, len(jax.devices())):
        mesh = make_mesh(ndev, axis)
        import copy

        s = copy.copy(sim)
        step, floes, ocean, domain = sharded_step(s, mesh, axis)
        out = step(floes, ocean, domain, jnp.asarray(0))
        jax.block_until_ready(out[0].centroid)
        t0 = time.perf_counter()
        for k in range(n_steps):
            floes, ocean, domain, _ = step(floes, ocean, domain, jnp.asarray(k))
        jax.block_until_ready(floes.centroid)
        res[ndev] = n_steps / (time.perf_counter() - t0)
    ndev = len(jax.devices())
    res["efficiency"] = res[ndev] / (res[1] * ndev)
    return res
