"""Multi-host launcher: distributed init + one-call sharded load.

Role parity: the reference's multi-process entry is
`mx.distributed.init()` plus `sharded_load` (reference
mlx_vlm/utils.py:815), which loads weights on every rank and slices each
tensor to the rank's shard before materializing.  On TPU the equivalent
is `jax.distributed.initialize()` (one JAX process per host, all chips
join a single global mesh over ICI/DCN) followed by sharding annotations
— XLA moves the bytes, no hand slicing.

Two-host invocation (same command on each host):

    # host 0
    python -c "
    from mlx_vlm_tpu.parallel import init_distributed, sharded_load
    init_distributed('10.0.0.1:8476', num_processes=2, process_id=0)
    model, processor = sharded_load('Qwen/Qwen2-VL-7B-Instruct',
                                    tensor_parallel=8)
    "
    # host 1: identical, but process_id=1

On GCE TPU pods, `init_distributed()` with NO arguments autodetects the
coordinator/process topology from the TPU metadata server (JAX's built-in
cluster detection), so the same script runs unmodified under
`gcloud compute tpus tpu-vm ssh --worker=all`.
"""

from __future__ import annotations

from typing import Optional

import jax

from .mesh import make_mesh
from .shard import shard_model

_INITIALIZED = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> int:
    """Join (or create) the multi-host JAX cluster; returns process index.

    Reference parity: `mx.distributed.init()` (utils.py:815).  Safe to
    call in single-process runs: when no coordinator is given and no
    cluster environment is detected, this is a no-op returning 0, so the
    same entrypoint works from a laptop to a pod slice.  Idempotent.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_index()
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except (RuntimeError, ValueError):
        # no coordinator given and JAX's cluster autodetection found no
        # multi-host environment: single-process run, nothing to join.
        # (Partial pod env vars — e.g. a tunneled single chip that still
        # exports TPU_WORKER_HOSTNAMES — land here too.  CPU backends
        # raise ValueError 'coordinator_address should be defined'
        # instead of RuntimeError.)
        if coordinator_address is not None or process_id is not None:
            raise
        return 0
    _INITIALIZED = True
    return jax.process_index()


def sharded_load(
    path_or_hf_repo: str,
    mesh=None,
    *,
    tensor_parallel: int = 1,
    pipeline_parallel: int = 1,
    expert_parallel: int = 1,
    data_parallel: Optional[int] = None,
    dtype=None,
    processor_kwargs: Optional[dict] = None,
    **kwargs,
):
    """Load (model, processor) sharded over a device mesh — one call.

    Reference parity: `sharded_load` (utils.py:815) = load + shard +
    materialize.  Composes `load()` → `make_mesh()` → `shard_model()`;
    pass an explicit `mesh` or the parallelism degrees.  Every process of
    a multi-host job calls this with identical arguments; weights are
    read host-side and placed shard-by-shard by XLA's sharded device_put.
    """
    import jax.numpy as jnp

    from ..utils.loader import load

    if dtype is None:
        dtype = jnp.bfloat16
    model, processor = load(
        path_or_hf_repo, processor_kwargs=processor_kwargs, dtype=dtype,
        **kwargs,
    )
    if mesh is None:
        mesh = make_mesh(
            tensor_parallel=tensor_parallel,
            data_parallel=data_parallel,
            pipeline_parallel=pipeline_parallel,
            expert_parallel=expert_parallel,
        )
    shard_model(model, mesh)
    return model, processor


def sharded_load_model(config: dict, weights: dict, mesh, dtype=None,
                       **kwargs):
    """In-memory variant (config + weights dict) for tests/embedding."""
    import jax.numpy as jnp

    from ..utils.loader import load_model_from_weights

    model = load_model_from_weights(
        config, weights, dtype or jnp.bfloat16, **kwargs)
    return shard_model(model, mesh)
