"""Phixtral — phi-2 parallel blocks with MoE gelu experts.

Role parity: reference mlx_vlm/models/phixtral/language.py — fused Wqkv
partial-rotary attention (RoPEAttention:15), softmax-after-topk routed
biased two-layer gelu experts (MOE:61), parallel residual sharing one
LayerNorm (ParallelBlock:87), biased lm_head.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import jax
import jax.numpy as jnp

import numpy as np

from ...core.moe import switch_mlp
from ..classic_base import ClassicConfig, ClassicLanguageModel, ClassicModel

_QKV_RE = re.compile(
    r"^transformer\.h\.(\d+)\.mixer\.Wqkv\.(weight|bias)$")
_EXPERT_RE = re.compile(
    r"^transformer\.h\.(\d+)\.moe\.mlp\.(\d+)\.(fc1|fc2)\.(weight|bias)$")


class ModelConfig(ClassicConfig):
    num_local_experts: int = 4
    num_experts_per_tok: int = 2

    @classmethod
    def from_dict(cls, d: dict) -> "ModelConfig":
        dims = d.get("model_dim", d.get("hidden_size", 2560))
        heads = d.get("num_heads", d.get("num_attention_heads", 32))
        cfg = cls(
            model_type="phixtral",
            hidden_size=dims,
            num_hidden_layers=d.get("num_layers",
                                    d.get("num_hidden_layers", 32)),
            num_attention_heads=heads,
            intermediate_size=4 * dims,
            vocab_size=d.get("num_vocab", d.get("vocab_size", 51200)),
            layer_norm_eps=d.get("layer_norm_eps", 1e-5),
            max_position_embeddings=d.get("max_position_embeddings", 2048),
            tie_word_embeddings=False,
            rope_pct=d.get("rotary_dim", 32) / (dims // heads),
            norm="layer",
            parallel=True,
            parallel_shared_ln=True,
            act="gelu_tanh",
        )
        cfg.num_local_experts = d.get("num_local_experts", 4)
        cfg.num_experts_per_tok = d.get("num_experts_per_tok", 2)
        return cfg


class LanguageModel(ClassicLanguageModel):
    def _mlp(self, p, x):
        a = self.args
        B, S, D = x.shape
        flat = x.reshape(B * S, D)
        gates = (flat.astype(jnp.float32)
                 @ p["gate"]["weight"].astype(jnp.float32).T)
        top, idx = jax.lax.top_k(gates, a.num_experts_per_tok)
        wts = jax.nn.softmax(top, axis=-1).astype(x.dtype)
        out = switch_mlp(
            flat, p["fc1"]["weight"], p["fc2"]["weight"], idx, wts,
            act=lambda v: jax.nn.gelu(v, approximate=True),
            biases=(p["fc1"]["bias"], p["fc2"]["bias"]))
        return out.reshape(B, S, D)


class Model(ClassicModel):
    CONFIG_CLS = ModelConfig

    def __init__(self, config):
        self.config = config
        self.language_model = LanguageModel(config, config)

    def sanitize(self, weights: dict) -> dict:
        D = self.config.hidden_size
        out = {}
        stacks: dict = {}
        for k, v in weights.items():
            if "rotary_emb" in k:
                continue
            m = _QKV_RE.match(k)
            if m:
                i, suf = m.group(1), m.group(2)
                base = f"language_model.model.layers.{i}.attn"
                out[f"{base}.q_proj.{suf}"] = v[:D]
                out[f"{base}.k_proj.{suf}"] = v[D:2 * D]
                out[f"{base}.v_proj.{suf}"] = v[2 * D:]
                continue
            m = _EXPERT_RE.match(k)
            if m:
                i, e, proj, suf = (m.group(1), int(m.group(2)),
                                   m.group(3), m.group(4))
                stacks.setdefault((i, proj, suf), {})[e] = np.asarray(v)
                continue
            if k == "transformer.embd.wte.weight":
                out["language_model.model.wte.weight"] = v
                continue
            if k.startswith("lm_head.ln."):
                out["language_model.model.ln_f."
                    + k[len("lm_head.ln."):]] = v
                continue
            if k.startswith("lm_head.linear."):
                out["language_model.lm_head."
                    + k[len("lm_head.linear."):]] = v
                continue
            k = re.sub(r"^transformer\.h\.(\d+)\.",
                       r"language_model.model.layers.\1.", k)
            k = k.replace(".ln.", ".ln1.")
            k = k.replace(".mixer.out_proj.", ".attn.o_proj.")
            k = k.replace(".moe.gate.", ".mlp.gate.")
            out[k] = v
        for (i, proj, suf), items in stacks.items():
            w = np.stack([items[e] for e in sorted(items)])
            out[f"language_model.model.layers.{i}.mlp.{proj}.{suf}"] = w
        return out
