"""GPT-NeoX / Pythia (reference mlx_vlm/models/gpt_neox/ — per-head
interleaved fused qkv, partial rotary (rotary_pct), optional parallel
residual, gelu-tanh MLP)."""

from __future__ import annotations

import re

import numpy as np

from ..classic_base import ClassicConfig, ClassicLanguageModel, ClassicModel

_QKV_RE = re.compile(
    r"^gpt_neox\.layers\.(\d+)\.attention\.query_key_value\.(weight|bias)$")


class ModelConfig(ClassicConfig):
    @classmethod
    def from_dict(cls, d: dict) -> "ModelConfig":
        return cls(
            model_type="gpt_neox",
            hidden_size=d.get("hidden_size", 2048),
            num_hidden_layers=d.get("num_hidden_layers", 24),
            num_attention_heads=d.get("num_attention_heads", 16),
            intermediate_size=d.get("intermediate_size"),
            vocab_size=d.get("vocab_size", 50432),
            layer_norm_eps=d.get("layer_norm_eps", 1e-5),
            max_position_embeddings=d.get("max_position_embeddings", 2048),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            rope_pct=d.get("rotary_pct", 0.25),
            rope_theta=d.get("rotary_emb_base", 10000.0),
            norm="layer",
            parallel=d.get("use_parallel_residual", True),
            act="gelu_tanh",
        )


LanguageModel = ClassicLanguageModel


class Model(ClassicModel):
    CONFIG_CLS = ModelConfig

    def sanitize(self, weights: dict) -> dict:
        a = self.config
        H, hd = a.num_attention_heads, a.head_dim
        out = {}
        for k, v in weights.items():
            if "rotary_emb" in k or "attention.bias" in k or (
                    "masked_bias" in k):
                continue
            m = _QKV_RE.match(k)
            if m:
                i, suf = m.group(1), m.group(2)
                # per-head interleave: rows [h, {q,k,v}, hd]
                v3 = np.asarray(v).reshape(H, 3, hd, *np.asarray(v).shape[1:])
                base = f"language_model.model.layers.{i}.attn"
                out[f"{base}.q_proj.{suf}"] = np.ascontiguousarray(
                    v3[:, 0].reshape(H * hd, -1).squeeze())
                out[f"{base}.k_proj.{suf}"] = np.ascontiguousarray(
                    v3[:, 1].reshape(H * hd, -1).squeeze())
                out[f"{base}.v_proj.{suf}"] = np.ascontiguousarray(
                    v3[:, 2].reshape(H * hd, -1).squeeze())
                continue
            k = re.sub(r"^gpt_neox\.layers\.(\d+)\.",
                       r"language_model.model.layers.\1.", k)
            k = k.replace(".input_layernorm.", ".ln1.")
            k = k.replace(".post_attention_layernorm.", ".ln2.")
            k = k.replace(".attention.dense.", ".attn.o_proj.")
            k = k.replace(".mlp.dense_h_to_4h.", ".mlp.fc1.")
            k = k.replace(".mlp.dense_4h_to_h.", ".mlp.fc2.")
            if k == "gpt_neox.embed_in.weight":
                k = "language_model.model.wte.weight"
            elif k.startswith("gpt_neox.final_layer_norm."):
                k = ("language_model.model.ln_f."
                     + k[len("gpt_neox.final_layer_norm."):])
            elif k.startswith("embed_out."):
                k = "language_model.lm_head." + k[len("embed_out."):]
            out[k] = v
        return out
