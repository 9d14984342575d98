"""GPT-OSS top-level model + checkpoint sanitisation.

Role parity: reference mlx_vlm/models/gpt_oss/gpt_oss.py (wrapper) and
language.py sanitize:225-262 — fused `gate_up_proj` [E, D, 2I] with
even/odd gate/up interleave, per-expert biases, `router.weight|bias`,
per-head `self_attn.sinks`.
"""

from __future__ import annotations

import numpy as np

from ..llama.llama import text_position_ids
from .config import ModelConfig, TextConfig
from .language import LanguageModel

STACK_PATTERNS = ("language_model.model.layers",)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config)

    def get_input_embeddings(self, params, input_ids, pixel_values=None, **aux):
        return self.language_model.embed(params["language_model"], input_ids)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache, position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return text_position_ids(input_ids, attention_mask)

    def vision_aux_inputs(self, grid_thw):
        return {}

    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            if k.endswith(".mlp.experts.gate_up_proj"):
                # [E, D, 2I] interleaved -> [E, I, D] gate / up stacks
                v = np.asarray(v)
                base = k[: -len("gate_up_proj")]
                out["language_model." + base + "gate_proj.weight"] = (
                    np.ascontiguousarray(v[..., ::2].transpose(0, 2, 1))
                )
                out["language_model." + base + "up_proj.weight"] = (
                    np.ascontiguousarray(v[..., 1::2].transpose(0, 2, 1))
                )
                continue
            if k.endswith(".mlp.experts.gate_up_proj_bias"):
                v = np.asarray(v)
                base = k[: -len("gate_up_proj_bias")]
                out["language_model." + base + "gate_proj.bias"] = (
                    np.ascontiguousarray(v[..., ::2])
                )
                out["language_model." + base + "up_proj.bias"] = (
                    np.ascontiguousarray(v[..., 1::2])
                )
                continue
            if k.endswith(".mlp.experts.down_proj"):
                # [E, I, D] -> [E, D, I]
                v = np.ascontiguousarray(np.asarray(v).transpose(0, 2, 1))
                k = k + ".weight"
            elif k.endswith(".mlp.experts.down_proj_bias"):
                k = k[: -len("down_proj_bias")] + "down_proj.bias"
            if not k.startswith("language_model."):
                k = "language_model." + k
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return STACK_PATTERNS


__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel"]
