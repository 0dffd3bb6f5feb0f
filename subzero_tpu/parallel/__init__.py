from .mesh import make_mesh, measure_scaling, shard_state, sharded_step  # noqa: F401
