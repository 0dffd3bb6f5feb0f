"""subzero_tpu: a TPU-native sea-ice discrete-element model.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference model Subzero.jl (Caltech-OCTO/Subzero.jl): explicit polygonal ice
floes advected on a 2-D ocean/atmosphere grid, colliding through polygon
intersection "soft contact" forces, coupled to prescribed ocean/atmosphere
fields, with floe life-cycle processes (fracture, ridging/rafting, welding,
fusing, simplification, dissolution).

Design: fixed-shape padded arrays + masking everywhere, SPMD sharding over a
jax device Mesh for multi-chip scaling, and batched geometry kernels instead
of per-pair dynamic polygon booleans.
"""

__version__ = "0.1.0"

from .constants import Constants  # noqa: F401
from .settings import (  # noqa: F401
    FloeSettings,
    CouplingSettings,
    CollisionSettings,
    FractureSettings,
    SimplificationSettings,
    RidgeRaftSettings,
    WeldSettings,
    MonteCarloPointsGenerator,
    SubGridPointsGenerator,
)
