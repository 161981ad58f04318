from .sharding import cell_mesh, shard_state, sharded_step  # noqa: F401
