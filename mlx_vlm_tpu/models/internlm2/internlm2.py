"""InternLM2 text model: llama decoder fed by key renames + grouped-wqkv
split.

Role parity: reference mlx_vlm/models/internlm2/language.py — grouped fused
wqkv layout [(n_kv, groups+2, head_dim), D]:94-101, w1/w3/w2 SwiGLU:121-129,
attention_norm/ffn_norm names:137-138, tok_embeddings/output:157.  Dynamic
NTK rope rescaling beyond max_position_embeddings is not applied (standard
rope within the trained context).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..llama.config import TextConfig as _LlamaText
from ..llama.language import LanguageModel
from ..llama.llama import text_position_ids


@dataclass
class TextConfig(_LlamaText):
    model_type: str = "internlm2"


ModelConfig = TextConfig


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

    def sanitize(self, weights: dict) -> dict:
        a = self.config
        hd = a.head_dim or a.hidden_size // a.num_attention_heads
        n_kv = a.num_key_value_heads
        g = a.num_attention_heads // n_kv
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            k = (k.replace(".attention.wqkv", ".self_attn.wqkv")
                 .replace(".attention.wo", ".self_attn.o_proj")
                 .replace(".attention_norm", ".input_layernorm")
                 .replace(".ffn_norm", ".post_attention_layernorm")
                 .replace(".feed_forward.w1", ".mlp.gate_proj")
                 .replace(".feed_forward.w3", ".mlp.up_proj")
                 .replace(".feed_forward.w2", ".mlp.down_proj")
                 .replace("model.tok_embeddings", "model.embed_tokens"))
            if k == "output.weight":
                k = "lm_head.weight"
            if k.endswith("self_attn.wqkv.weight"):
                w = np.asarray(v).reshape(n_kv, g + 2, hd, -1)
                stem = k[: -len("wqkv.weight")]
                out[stem + "q_proj.weight"] = w[:, :g].reshape(
                    n_kv * g * hd, -1)
                out[stem + "k_proj.weight"] = w[:, g].reshape(n_kv * hd, -1)
                out[stem + "v_proj.weight"] = w[:, g + 1].reshape(n_kv * hd, -1)
                continue
            if not k.startswith("language_model."):
                k = "language_model." + k
            out[k] = v
        # the q/k/v splits above still need the prefix
        return {
            (k if k.startswith("language_model.") else "language_model." + k): v
            for k, v in out.items()
        }

    @property
    def stack_patterns(self):
        return ("language_model.model.layers",)
