"""Multi-host (multi-process) execution support.

The reference is strictly single-process (Threads.@threads only,
/root/reference/src/physical_processes/collisions.jl:745); this module is
the TPU-native scale-out layer on top of the domain decomposition
(parallel/decomp.py): one JAX process per host, a global device mesh
spanning all processes, halo exchange riding ICI within a slice and DCN
across hosts exactly as compiled by XLA from the same shard_map program
that runs single-process.

Design: SPMD all the way down, including the HOST lifecycle passes.
Every process executes the same ``run_decomp`` loop; device state lives in
global (cross-process) arrays; whenever host code needs the pool (fracture,
welding, ridge/raft, fusing, writers), the active rows are compacted on
device and **replicated** to every process (one all-gather), and every
process runs the identical deterministic host pass with an identical
numpy RNG stream - so the redistributed pool is consistent WITHOUT a
broadcast step.  Only process 0 performs I/O (writers, logging, progress).

Usage on a real multi-host platform::

    # one process per host, started by the launcher with its own rank
    from subzero_tpu.parallel import multihost
    multihost.initialize()              # jax.distributed auto-config
    dec = make_decomp(floes, domain)    # global mesh over all hosts
    run_decomp(sim, dec)                # identical call to single-process

Verified in this repo with 2 CPU processes (Gloo collectives), 4 virtual
devices each, against the 1-process 8-device trajectory:
``tests/test_multihost.py``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = [
    "initialize", "is_io_process", "replicate_to_host", "mesh_of",
]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
):
    """Start the JAX distributed runtime (call before any other JAX use).

    With no arguments, defers to ``jax.distributed.initialize()``'s
    auto-configuration (TPU pods populate coordinator/rank from the
    environment).  Explicit arguments support manual launches, e.g. the
    2-process CPU verification harness.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def is_io_process() -> bool:
    """True on the single process that performs writers/logging."""
    return jax.process_index() == 0


def mesh_of(tree):
    """The device mesh a distributed pytree is sharded over."""
    leaf = jax.tree.leaves(tree)[0]
    return leaf.sharding.mesh


def replicate_to_host(tree, mesh=None):
    """Bring a (possibly cross-process sharded) pytree to host numpy on
    EVERY process.

    Single-process: a plain device->host copy.  Multi-process: one jitted
    identity with fully-replicated output sharding (XLA emits the
    all-gather), after which each process holds every shard and the
    host copy is local.
    """
    if jax.process_count() == 1:
        return jax.tree.map(lambda a: np.asarray(a), tree)
    if mesh is None:
        mesh = mesh_of(tree)
    rep = jax.jit(
        lambda t: t,
        out_shardings=jax.tree.map(
            lambda _: NamedSharding(mesh, P()), tree
        ),
    )(tree)
    return jax.tree.map(lambda a: np.asarray(a), rep)
