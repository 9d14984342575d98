from .launch import init_distributed, sharded_load, sharded_load_model
from .mesh import make_mesh
from .shard import apply_shardings, partition_rules, shard_model

__all__ = [
    "init_distributed",
    "make_mesh",
    "apply_shardings",
    "partition_rules",
    "shard_model",
    "sharded_load",
    "sharded_load_model",
]
