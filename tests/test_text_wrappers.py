"""Text-only wrappers over VL decoders: minimax_m3, llama4_text."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.loader import load_model_from_weights

from test_llama4 import tiny_llama4_config, tiny_llama4_weights
from test_minimax_m3_vl import tiny_minimax_config, tiny_minimax_weights

IDS = (np.arange(6, dtype=np.int32) * 7 % 120)[None]


def _gen(model, n=3):
    e = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(IDS))
    return [int(t[0]) for t, _ in generate_step(e, model, max_tokens=n)]


class TestMinimaxM3Text:
    def test_flat_text_checkpoint(self):
        vl_cfg = tiny_minimax_config()
        flat = dict(vl_cfg["text_config"])
        flat["model_type"] = "minimax_m3"
        w = {k: v for k, v in tiny_minimax_weights(vl_cfg).items()
             if not k.startswith(("model.vision_tower.",
                                  "model.multi_modal_projector.",
                                  "model.patch_merge_mlp.",
                                  "vision_tower."))}
        # flat text checkpoints keep model.* keys directly
        w = {(k.replace("model.language_model.model.", "model.")
              if k.startswith("model.language_model.model.") else k): v
             for k, v in w.items()}
        m = load_model_from_weights(flat, w, jnp.float32)
        assert len(_gen(m)) == 3


class TestLlama4Text:
    def test_flat_text_checkpoint(self):
        vl_cfg = tiny_llama4_config()
        flat = dict(vl_cfg["text_config"])
        flat["model_type"] = "llama4_text"
        w = {}
        for k, v in tiny_llama4_weights(vl_cfg).items():
            if k.startswith(("vision_model.", "multi_modal_projector.")):
                continue
            if k.startswith("language_model."):
                k = k[len("language_model."):]
            w[k] = v
        m = load_model_from_weights(flat, w, jnp.float32)
        assert len(_gen(m)) == 3


class TestErnie45MoeText:
    def test_flat_text_checkpoint(self):
        from test_ernie4_5_moe_vl import tiny_ernie_config, tiny_ernie_weights

        vl_cfg = tiny_ernie_config()
        flat = dict(vl_cfg["text_config"])
        flat["model_type"] = "ernie4_5_moe"
        # single text expert group: int counts, no vision experts
        flat["moe_num_experts"] = 4
        flat["moe_intermediate_size"] = 16
        w = {}
        n_text = 4
        for k, v in tiny_ernie_weights(vl_cfg).items():
            if k.startswith(("vision_model.", "model.resampler_model",
                             "resampler_model")):
                continue
            import re

            m = re.match(r"^(model\.layers\.\d+\.mlp)\.experts\.(\d+)\.(.+)$",
                         k)
            if m and int(m.group(2)) >= n_text:
                continue  # drop the vision expert group
            if "mlp.gate.weight_1" in k:  # vision router
                continue
            w[k] = v
        m = load_model_from_weights(flat, w, jnp.float32)
        assert len(_gen(m)) == 3


class TestMistral4Remap:
    def test_remap_and_generate(self):
        from mlx_vlm_tpu.utils.loader import MODEL_REMAPPING
        from test_deepseek_v2 import tiny_dsv2_config, tiny_dsv2_weights

        assert MODEL_REMAPPING.get("mistral4") == "deepseek_v2"
        cfg = tiny_dsv2_config()
        cfg["model_type"] = "mistral4"
        cfg["topk_method"] = "greedy"  # mistral4 routes softmax-then-topk
        m = load_model_from_weights(cfg, tiny_dsv2_weights(cfg),
                                    jnp.float32)
        assert len(_gen(m)) == 3
