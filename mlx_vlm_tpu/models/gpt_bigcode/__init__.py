"""GPT-BigCode / StarCoder v1 (reference mlx_vlm/models/gpt_bigcode/ —
fused c_attn with multi-query attention, learned absolute positions,
gelu MLP with biases, tied head).

TPU design: rides ClassicLanguageModel (scanned decoder, wpe gather);
the fused c_attn splits to q/k/v at sanitize time so the scan stacks
uniform per-linear weights (same approach as gpt2's Conv1D split).
"""

from __future__ import annotations

import re

import numpy as np

from ..classic_base import ClassicConfig, ClassicLanguageModel, ClassicModel

_ATTN_RE = re.compile(r"^h\.(\d+)\.attn\.c_attn\.(weight|bias)$")


class ModelConfig(ClassicConfig):
    @classmethod
    def from_dict(cls, d: dict) -> "ModelConfig":
        n_head = d.get("n_head", 12)
        n_embd = d.get("n_embd", 768)
        multi_query = d.get("multi_query", True)
        return cls(
            model_type="gpt_bigcode",
            hidden_size=n_embd,
            num_hidden_layers=d.get("n_layer", 12),
            num_attention_heads=n_head,
            num_key_value_heads=(
                d.get("num_key_value_heads")
                or (1 if multi_query else n_head)),
            intermediate_size=d.get("n_inner") or 4 * n_embd,
            vocab_size=d.get("vocab_size", 49152),
            layer_norm_eps=d.get("layer_norm_epsilon", 1e-5),
            max_position_embeddings=d.get("n_positions", 8192),
            tie_word_embeddings=d.get("tie_word_embeddings", True),
            rope_pct=0.0,
            norm="layer",
            parallel=False,
            act="gelu",
        )


LanguageModel = ClassicLanguageModel


class Model(ClassicModel):
    CONFIG_CLS = ModelConfig

    def sanitize(self, weights: dict) -> dict:
        cfg = self.config
        D = cfg.hidden_size
        kvd = cfg.num_key_value_heads * cfg.head_dim
        out = {}
        for k, v in weights.items():
            k = k[len("transformer."):] if k.startswith("transformer.") else k
            if re.match(r"^h\.\d+\.attn\.bias$", k) or "masked_bias" in k:
                continue
            m = _ATTN_RE.match(k)
            if m:
                # c_attn packs [q | k | v] rows: D + kvd + kvd (MQA)
                i, suf = m.group(1), m.group(2)
                base = f"language_model.model.layers.{i}.attn"
                out[f"{base}.q_proj.{suf}"] = v[:D]
                out[f"{base}.k_proj.{suf}"] = v[D:D + kvd]
                out[f"{base}.v_proj.{suf}"] = v[D + kvd:]
                continue
            k = re.sub(r"^h\.(\d+)\.", r"language_model.model.layers.\1.", k)
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
            elif k == "lm_head.weight":
                k = "lm_head.weight"
            if not k.startswith(("language_model.", "lm_head.")):
                k = "language_model.model." + k
            out[k] = v
        return out


__all__ = ["Model", "ModelConfig", "LanguageModel"]
