from .mesh import make_mesh
from .shard import apply_shardings, partition_rules_qwen2, shard_model

__all__ = ["make_mesh", "apply_shardings", "partition_rules_qwen2", "shard_model"]
