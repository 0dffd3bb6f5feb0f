from .mesh import make_mesh, measure_scaling, shard_state, sharded_step  # noqa: F401
from .decomp import (  # noqa: F401
    Decomp,
    build_decomp_step,
    distribute,
    gather,
    make_decomp,
    measure_decomp_scaling,
    run_decomp,
)
