"""Bailing/Ling MoE (inclusionAI) — fused-qkv MoE decoder.

Role parity: reference mlx_vlm/models/bailing_moe/language.py —
query_key_value + dense attention with optional per-head q/k layernorms
(:26), expert_bias group routing with sigmoid or softmax scoring (:105),
first-k-dense layers, optional norm_head (row-normalized lm_head,
sanitize:293), model.word_embeddings embedding table.

The architecture is the ancestor of LLaDA2-MoE, so it rides that module
(causal, no diffusion) with the word_embeddings/attention key renames.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..llada2_moe.llada2_moe import LanguageModel
from ..llada2_moe.llada2_moe import Model as _Llada2Model
from ..llada2_moe.llada2_moe import TextConfig as _Llada2Text


@dataclass
class TextConfig(_Llada2Text):
    model_type: str = "bailing_moe"
    diffusion: bool = False
    norm_head: bool = False
    moe_router_enable_expert_bias: bool = True
    vocab_size: int = 126464


ModelConfig = TextConfig


class Model(_Llada2Model):
    def sanitize(self, weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            k = k.replace("model.word_embeddings.", "model.embed_tokens.")
            k = k.replace(".attention.", ".self_attn.")
            out[k] = v
        if self.config.norm_head and "lm_head.weight" in out:
            w = np.asarray(out["lm_head.weight"], np.float32)
            out["lm_head.weight"] = (
                w / (np.linalg.norm(w, axis=0, keepdims=True) + 1e-7)
            ).astype(np.float32)
        return super().sanitize(out)
