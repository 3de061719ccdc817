from llamatpu.parallel.mesh import make_mesh
from llamatpu.parallel.shard import cache_shardings, shard_model, weight_shardings

__all__ = ["make_mesh", "weight_shardings", "cache_shardings", "shard_model"]
