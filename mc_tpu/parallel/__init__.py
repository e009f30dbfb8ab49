from mc_tpu.parallel.mesh import (make_mesh, price_sharded, shard_bounds)

__all__ = ["make_mesh", "price_sharded", "shard_bounds"]
