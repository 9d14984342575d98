"""Phi-1/2 (reference mlx_vlm/models/phi/ — parallel block sharing one
LayerNorm, partial rotary (factor 0.4), gelu-tanh MLP, biased lm_head)."""

from __future__ import annotations

import re

from ..classic_base import ClassicConfig, ClassicLanguageModel, ClassicModel


class ModelConfig(ClassicConfig):
    @classmethod
    def from_dict(cls, d: dict) -> "ModelConfig":
        return cls(
            model_type="phi",
            hidden_size=d.get("hidden_size", 2560),
            num_hidden_layers=d.get("num_hidden_layers", 32),
            num_attention_heads=d.get("num_attention_heads", 32),
            num_key_value_heads=d.get("num_key_value_heads"),
            intermediate_size=d.get("intermediate_size"),
            vocab_size=d.get("vocab_size", 51200),
            layer_norm_eps=d.get("layer_norm_eps", 1e-5),
            max_position_embeddings=d.get("max_position_embeddings", 2048),
            tie_word_embeddings=False,
            rope_pct=d.get("partial_rotary_factor", 0.4),
            rope_theta=d.get("rope_theta", 10000.0),
            norm="layer",
            parallel=True,
            parallel_shared_ln=True,
            act="gelu_tanh",
        )


LanguageModel = ClassicLanguageModel


class Model(ClassicModel):
    CONFIG_CLS = ModelConfig

    def sanitize(self, weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "rotary_emb" in k:
                continue
            k = re.sub(r"^model\.layers\.(\d+)\.",
                       r"language_model.model.layers.\1.", k)
            k = k.replace(".input_layernorm.", ".ln1.")
            k = k.replace(".self_attn.dense.", ".attn.o_proj.")
            k = k.replace(".self_attn.", ".attn.")
            k = k.replace(".mlp.fc1.", ".mlp.fc1.")
            k = k.replace(".mlp.fc2.", ".mlp.fc2.")
            if k == "model.embed_tokens.weight":
                k = "language_model.model.wte.weight"
            elif k.startswith("model.final_layernorm."):
                k = ("language_model.model.ln_f."
                     + k[len("model.final_layernorm."):])
            elif k.startswith("lm_head."):
                k = "language_model." + k
            out[k] = v
        return out
