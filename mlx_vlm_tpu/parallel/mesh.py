"""Device-mesh utilities.

Role parity: reference distributed init `mx.distributed.init()` + group
split (mlx_vlm/utils.py:815 sharded_load).  On TPU the launcher is simply
`jax.distributed.initialize()` (multi-host) and a `jax.sharding.Mesh` over
ICI; collectives are emitted by XLA from sharding annotations
(SURVEY.md §2.10 "TPU-native equivalents").
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    tensor_parallel: int = 1,
    data_parallel: Optional[int] = None,
    pipeline_parallel: int = 1,
    expert_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, pipe, expert, model) mesh; model axis innermost so TP
    collectives ride the fastest ICI links, expert all-to-alls next, then
    pipeline stages.  Axes of size 1 are kept (named axes are free).

    Expert parallelism is a capability the reference LACKS (its SwitchGLU
    computes every expert locally, switch_layers.py:156): MoE expert stacks
    shard their expert axis over "expert" (see parallel/shard.py rules) and
    XLA inserts the dispatch/combine collectives.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    denom = tensor_parallel * pipeline_parallel * expert_parallel
    if data_parallel is None:
        data_parallel = n // denom
    if data_parallel * denom != n:
        raise ValueError(
            f"{n} devices cannot form mesh "
            f"{data_parallel}x{pipeline_parallel}x{expert_parallel}"
            f"x{tensor_parallel}"
        )
    arr = np.asarray(devices).reshape(
        data_parallel, pipeline_parallel, expert_parallel, tensor_parallel
    )
    return Mesh(arr, ("data", "pipe", "expert", "model"))
