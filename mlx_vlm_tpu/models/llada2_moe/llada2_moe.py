"""LLaDA2-MoE: masked-diffusion MoE language model.

Role parity: reference mlx_vlm/models/llada2_moe/ — fused query_key_value
attention with partial rotary + qk-norm (language.py:128), sigmoid
group-limited expert routing with expert_bias (:65, same noaux_tc rule as
glm4_moe/deepseek-v3), first-k-dense layers, shared experts, and the
block-diffusion unmasking generator (:350, generate/diffusion.py here).

TPU design: rides the glm4_moe role-split dense/MoE scans; the fused
qkv / renamed-norm checkpoint keys are split to the shared q/k/v layout
at sanitize time (static splits, no runtime cost).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

from ..glm4_moe.config import TextConfig as _MoEText
from ..glm4_moe.glm4_moe import Model as _MoEModel
from ..glm4_moe.language import LanguageModel as _MoELM
from ..llama.llama import text_position_ids  # noqa: F401


@dataclass
class TextConfig(_MoEText):
    model_type: str = "llada2_moe"
    vocab_size: int = 157184
    hidden_size: int = 2048
    intermediate_size: int = 5120
    num_hidden_layers: int = 20
    num_attention_heads: int = 16
    num_key_value_heads: int = 4
    rope_theta: float = 600000.0
    rms_norm_eps: float = 1e-6
    n_group: int = 8
    topk_group: int = 4
    routed_scaling_factor: float = 2.5
    moe_intermediate_size: int = 512
    num_experts: int = 256
    num_shared_experts: int = 1
    use_qkv_bias: bool = False
    use_qk_norm: bool = True
    use_bias: bool = False
    rotary_dim: Optional[int] = None
    mask_token_id: int = 156895
    diffusion: bool = True
    attention_bias: bool = False

    def __post_init__(self):
        super().__post_init__()
        self.n_routed_experts = self.num_experts
        self.n_shared_experts = self.num_shared_experts
        if self.rotary_dim:
            self.partial_rotary_factor = self.rotary_dim / self.head_dim


ModelConfig = TextConfig

_QKV_RE = re.compile(r"(.*\.self_attn)\.query_key_value\.(weight|bias|"
                     r"scales|biases)$")


class LanguageModel(_MoELM):
    pass


class Model(_MoEModel):
    def __init__(self, config: TextConfig):
        self.config = config
        self.language_model = LanguageModel(config)
        self._k_dense = config.first_k_dense_replace

    def sanitize(self, weights: dict) -> dict:
        a = self.config
        nq = a.num_attention_heads * a.head_dim
        nkv = a.num_key_value_heads * a.head_dim
        out = {}
        for k, v in weights.items():
            m = _QKV_RE.match(k)
            if m and getattr(v, "ndim", 0) >= 1 and v.shape[0] == nq + 2 * nkv:
                base, suf = m.group(1), m.group(2)
                out[f"{base}.q_proj.{suf}"] = v[:nq]
                out[f"{base}.k_proj.{suf}"] = v[nq:nq + nkv]
                out[f"{base}.v_proj.{suf}"] = v[nq + nkv:]
                continue
            k = k.replace(".self_attn.dense.", ".self_attn.o_proj.")
            k = k.replace(".self_attn.query_layernorm.",
                          ".self_attn.q_norm.")
            k = k.replace(".self_attn.key_layernorm.", ".self_attn.k_norm.")
            k = k.replace(".mlp.gate.expert_bias",
                          ".mlp.gate.e_score_correction_bias")
            out[k] = v
        return super().sanitize(out)

    def forward_full(self, params, input_ids, causal: bool = False):
        """Bidirectional full-canvas forward -> logits [B, S, V]
        (the diffusion demasking driver's traceable step)."""
        lm = params["language_model"]
        embeds = self.language_model.embed(lm, input_ids)
        B, S = input_ids.shape
        pos = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32)[None], (B, S))
        hidden, _ = self.language_model(lm, embeds, None, pos,
                                        causal=causal)
        return self.language_model.logits(lm, hidden)
