"""Mixtral sparse-MoE text model.

Role parity: reference mlx_vlm/models/mixtral/language.py — llama attention
(rope_theta 1e6, no bias):15, top-k-then-softmax routing:89-96, per-expert
w1/w3/w2 checkpoint keys folded into a SwitchGLU stack (sanitize:189-206).

TPU design: rides the qwen2_moe scan-stacked MoE decoder.  Mixtral's
softmax(topk(logits)) routing equals our softmax-then-topk with
renormalisation (softmax restricted to the selected set), so only the key
layout differs: `block_sparse_moe.experts.{e}.w1|w3|w2` -> the stacked
`mlp.experts.{gate,up,down}_proj` the loader scans over.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..qwen2_moe.config import TextConfig as _MoEText
from ..qwen2_moe.language import MoELanguageModel
from ..qwen2_moe.qwen2_moe import Model as _MoEModel


@dataclass
class TextConfig(_MoEText):
    model_type: str = "mixtral"
    num_local_experts: int = 8
    num_experts_per_tok: int = 2
    norm_topk_prob: bool = True  # softmax over the selected experts
    attention_bias: bool = False
    rope_theta: float = 1e6

    def __post_init__(self):
        super().__post_init__()
        self.num_experts = self.num_local_experts


ModelConfig = TextConfig

_EXPERT_RE = re.compile(
    r"\.block_sparse_moe\.experts\.(\d+)\.(w1|w2|w3)\."
)
_EXPERT_NAME = {"w1": "gate_proj", "w2": "down_proj", "w3": "up_proj"}


class Model(_MoEModel):
    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            m = _EXPERT_RE.search(k)
            if m:
                k = (
                    k[: m.start()]
                    + f".mlp.experts.{m.group(1)}.{_EXPERT_NAME[m.group(2)]}."
                    + k[m.end():]
                )
            else:
                k = k.replace(".block_sparse_moe.gate.", ".mlp.gate.")
            if not k.startswith("language_model."):
                k = "language_model." + k
            out[k] = v
        return out
