from . import multihost  # noqa: F401
from .mesh import make_mesh, measure_scaling, shard_state, sharded_step  # noqa: F401
from .decomp import (  # noqa: F401
    Decomp,
    Decomp2D,
    build_decomp_segment,
    build_decomp_step,
    build_decomp_step_2d,
    build_decomp_step_halves,
    distribute,
    distribute_2d,
    gather,
    make_decomp,
    make_decomp_2d,
    measure_decomp_scaling,
    run_decomp,
)
