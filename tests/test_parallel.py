import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.parallel.mesh import make_mesh
from mlx_vlm_tpu.parallel.shard import partition_rules, shard_model
from mlx_vlm_tpu.utils.testing import make_tiny_qwen2_vl, tiny_qwen2_vl_config


needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


class TestSharding:
    @needs_8
    def test_tp_generation_matches_single_device(self):
        """TP-sharded forward must produce the same logits."""
        from mlx_vlm_tpu.generate.ar import generate_step

        model = make_tiny_qwen2_vl(seed=6, dtype=jnp.float32)
        ids = (np.arange(10, dtype=np.int32) % 200)[None]
        embeds = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
        ref = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=5)]

        model2 = make_tiny_qwen2_vl(seed=6, dtype=jnp.float32)
        mesh = make_mesh(tensor_parallel=2, data_parallel=4)
        shard_model(model2, mesh)
        # new engine for the sharded model instance
        e2 = jax.jit(model2.get_input_embeddings)(model2.params, jnp.asarray(ids))
        out = [int(t[0]) for t, _ in generate_step(e2, model2, max_tokens=5)]
        assert out == ref

    @needs_8
    def test_pp_tp_dp_mesh_training(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)

    @needs_8
    def test_sharded_weight_placement(self):
        model = make_tiny_qwen2_vl(seed=1, dtype=jnp.float32)
        mesh = make_mesh(tensor_parallel=2, data_parallel=2, pipeline_parallel=2)
        shard_model(model, mesh)
        w = model.params["language_model"]["model"]["layers"]["self_attn"]["q_proj"]["weight"]
        # layer axis sharded over pipe, out axis over model
        assert w.sharding.spec == jax.sharding.PartitionSpec("pipe", "model", None)

    def test_rules_cover_moe(self):
        rules = partition_rules("qwen2_moe")
        import re

        path = "language_model.model.layers.mlp.experts.gate_proj.weight"
        assert any(re.fullmatch(p, path) for p, _ in rules)
