"""Qwen-MoE decoder: llama attention + SwitchGLU expert MLP + shared expert.

Role parity: reference MoE decoders (qwen2_moe / qwen3_moe families) built
on SwitchGLU (switch_layers.py:24).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.layers import linear, swiglu_mlp
from ...core.moe import switch_glu, topk_router
from ..llama.language import LanguageModel as _Base
from .config import TextConfig


class MoELanguageModel(_Base):
    def __init__(self, args: TextConfig, config=None):
        super().__init__(args, config)
        self.top_k = args.num_experts_per_tok
        self.norm_topk = args.norm_topk_prob

    def _mlp(self, p, x):
        B, S, D = x.shape
        flat = x.reshape(B * S, D)
        indices, weights = topk_router(
            flat, p["gate"]["weight"], self.top_k, self.norm_topk
        )
        out = switch_glu(
            flat,
            p["experts"]["gate_proj"]["weight"],
            p["experts"]["up_proj"]["weight"],
            p["experts"]["down_proj"]["weight"],
            indices,
            weights,
        )
        if "shared_expert" in p:
            shared = swiglu_mlp(p["shared_expert"], flat)
            gate = jax.nn.sigmoid(
                linear(p["shared_expert_gate"], flat).astype(jnp.float32)
            ).astype(shared.dtype)
            out = out + gate * shared
        return out.reshape(B, S, D)
