from .sharding import cell_mesh, shard_state, sharded_step  # noqa: F401
from .halo import HaloMaps, halo_exchange  # noqa: F401
from .sharded import ShardedIsl  # noqa: F401
from .sharded_ir import ShardedIr  # noqa: F401
