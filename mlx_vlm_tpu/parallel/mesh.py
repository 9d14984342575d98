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
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, pipe, model) mesh; model axis innermost so TP
    collectives ride the fastest ICI links, pipeline stages next."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel is None:
        data_parallel = n // (tensor_parallel * pipeline_parallel)
    if data_parallel * tensor_parallel * pipeline_parallel != n:
        raise ValueError(
            f"{n} devices cannot form mesh "
            f"{data_parallel}x{pipeline_parallel}x{tensor_parallel}"
        )
    arr = np.asarray(devices).reshape(
        data_parallel, pipeline_parallel, tensor_parallel
    )
    return Mesh(arr, ("data", "pipe", "model"))
