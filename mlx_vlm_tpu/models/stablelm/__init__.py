"""StableLM (reference mlx_vlm/models/stablelm/ — partial rotary, SwiGLU
MLP, optional parallel residual and per-head qk LayerNorm stacks)."""

from __future__ import annotations

import re

import numpy as np

from ..classic_base import ClassicConfig, ClassicLanguageModel, ClassicModel


class ModelConfig(ClassicConfig):
    @classmethod
    def from_dict(cls, d: dict) -> "ModelConfig":
        return cls(
            model_type="stablelm",
            hidden_size=d.get("hidden_size", 2560),
            num_hidden_layers=d.get("num_hidden_layers", 32),
            num_attention_heads=d.get("num_attention_heads", 32),
            num_key_value_heads=d.get("num_key_value_heads", 32),
            intermediate_size=d.get("intermediate_size"),
            vocab_size=d.get("vocab_size", 50304),
            layer_norm_eps=d.get("layer_norm_eps", 1e-5),
            max_position_embeddings=d.get("max_position_embeddings", 4096),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            rope_pct=d.get("partial_rotary_factor", 0.25),
            rope_theta=d.get("rope_theta", 10000.0),
            norm="layer",
            parallel=d.get("use_parallel_residual", False),
            parallel_shared_ln=True,  # reference shares input_layernorm
            act="swiglu",
            qk_headnorm=d.get("qk_layernorm", False),
        )


LanguageModel = ClassicLanguageModel

_NORMSTACK_RE = re.compile(
    r"^model\.layers\.(\d+)\.self_attn\.(q|k)_layernorm\.norms\.(\d+)"
    r"\.weight$")


class Model(ClassicModel):
    CONFIG_CLS = ModelConfig

    def sanitize(self, weights: dict) -> dict:
        a = self.config
        out = {}
        stacks: dict = {}
        for k, v in weights.items():
            if "rotary_emb" in k:
                continue
            m = _NORMSTACK_RE.match(k)
            if m:
                i, which, h = m.group(1), m.group(2), int(m.group(3))
                stacks.setdefault((i, which), {})[h] = np.asarray(v)
                continue
            k = re.sub(r"^model\.layers\.(\d+)\.",
                       r"language_model.model.layers.\1.", k)
            k = k.replace(".input_layernorm.", ".ln1.")
            k = k.replace(".post_attention_layernorm.", ".ln2.")
            k = k.replace(".self_attn.", ".attn.")
            if k == "model.embed_tokens.weight":
                k = "language_model.model.wte.weight"
            elif k.startswith("model.norm."):
                k = "language_model.model.ln_f." + k[len("model.norm."):]
            elif k.startswith("lm_head."):
                k = "language_model." + k
            out[k] = v
        for (i, which), heads in stacks.items():
            w = np.stack([heads[h] for h in sorted(heads)])
            out[f"language_model.model.layers.{i}.attn.{which}_norms"
                ".weight"] = w
        return out
