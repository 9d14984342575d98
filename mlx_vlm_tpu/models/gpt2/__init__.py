"""GPT-2 (reference mlx_vlm/models/gpt2/ — fused Conv1D c_attn, learned
absolute positions, gelu-tanh MLP, tied head)."""

from __future__ import annotations

import re

import numpy as np

from ..classic_base import ClassicConfig, ClassicLanguageModel, ClassicModel

_ATTN_RE = re.compile(r"^h\.(\d+)\.attn\.c_attn\.(weight|bias)$")


class ModelConfig(ClassicConfig):
    @classmethod
    def from_dict(cls, d: dict) -> "ModelConfig":
        return cls(
            model_type="gpt2",
            hidden_size=d.get("n_embd", 768),
            num_hidden_layers=d.get("n_layer", 12),
            num_attention_heads=d.get("n_head", 12),
            vocab_size=d.get("vocab_size", 50257),
            layer_norm_eps=d.get("layer_norm_epsilon", 1e-5),
            max_position_embeddings=d.get("n_positions", 1024),
            tie_word_embeddings=True,
            rope_pct=0.0,
            norm="layer",
            parallel=False,
            act="gelu_tanh",
        )


LanguageModel = ClassicLanguageModel


class Model(ClassicModel):
    CONFIG_CLS = ModelConfig

    def sanitize(self, weights: dict) -> dict:
        D = self.config.hidden_size
        out = {}
        for k, v in weights.items():
            k = k[len("transformer."):] if k.startswith("transformer.") else k
            if re.match(r"^h\.\d+\.attn\.bias$", k) or "attn.masked_bias" in k:
                continue
            # HF Conv1D stores [in, out] — transpose to Linear layout
            if k.endswith(".weight") and (
                    ".c_attn." in k or ".c_proj." in k or ".c_fc." in k):
                v = np.ascontiguousarray(np.transpose(v))
            m = _ATTN_RE.match(k)
            if m:
                i, suf = m.group(1), m.group(2)
                base = f"language_model.model.layers.{i}.attn"
                out[f"{base}.q_proj.{suf}"] = v[:D]
                out[f"{base}.k_proj.{suf}"] = v[D:2 * D]
                out[f"{base}.v_proj.{suf}"] = v[2 * D:]
                continue
            k = re.sub(r"^h\.(\d+)\.", r"language_model.model.layers.\1.",
                       k)
            k = k.replace(".ln_1.", ".ln1.").replace(".ln_2.", ".ln2.")
            k = k.replace(".attn.c_proj.", ".attn.o_proj.")
            k = k.replace(".mlp.c_fc.", ".mlp.fc1.")
            k = k.replace(".mlp.c_proj.", ".mlp.fc2.")
            if k == "wte.weight":
                k = "language_model.model.wte.weight"
            elif k == "wpe.weight":
                k = "language_model.model.wpe.weight"
            elif k.startswith("ln_f."):
                k = "language_model.model." + k
            out[k] = v
        return out
