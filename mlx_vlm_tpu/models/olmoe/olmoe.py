"""OLMoE sparse-MoE text model.

Role parity: reference mlx_vlm/models/olmoe/language.py — whole-projection
q/k RMSNorms applied BEFORE the head reshape:41-53 (shape [n_heads*head_dim],
unlike qwen3's per-head-dim norms), softmax-then-topk routing with optional
renorm:90-100, no shared expert.

TPU design: qwen2_moe scan decoder with `_qkv` overridden to normalise the
flat q/k projections; the checkpoint's `mlp.gate` / `mlp.experts.{e}.*`
layout already matches the stacked SwitchGLU keys.
"""

from __future__ import annotations

from dataclasses import dataclass

from ...core.layers import linear, rms_norm
from ..qwen2_moe.config import TextConfig as _MoEText
from ..qwen2_moe.language import MoELanguageModel
from ..qwen2_moe.qwen2_moe import Model as _MoEModel


@dataclass
class TextConfig(_MoEText):
    model_type: str = "olmoe"
    num_experts: int = 64
    num_experts_per_tok: int = 8
    norm_topk_prob: bool = False
    attention_bias: bool = False
    rope_theta: float = 10000.0


ModelConfig = TextConfig


class OlmoeLanguageModel(MoELanguageModel):
    def _qkv(self, p, x):
        B, S, _ = x.shape
        q = linear(p["q_proj"], x)
        k = linear(p["k_proj"], x)
        # flat-vector norms over n_heads*head_dim (reference olmoe:52-53)
        q = rms_norm(p["q_norm"], q, self.args.rms_norm_eps)
        k = rms_norm(p["k_norm"], k, self.args.rms_norm_eps)
        v = linear(p["v_proj"], x)
        q = q.reshape(B, S, self.n_heads, self.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, self.n_kv_heads, self.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, self.n_kv_heads, self.head_dim).transpose(0, 2, 1, 3)
        return q, k, v


class Model(_MoEModel):
    def __init__(self, config: TextConfig):
        self.config = config
        self.language_model = OlmoeLanguageModel(config)
