from .mesh import make_mesh
from .shard import apply_shardings, partition_rules, shard_model

__all__ = ["make_mesh", "apply_shardings", "partition_rules", "shard_model"]
