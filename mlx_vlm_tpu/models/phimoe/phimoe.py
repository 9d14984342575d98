"""PhiMoE (Phi-3.5-MoE) text model.

Role parity: reference mlx_vlm/models/phimoe/language.py — SuScaledRoPE
(long_factor + explicit long/short mscale):32-41, LayerNorm (not RMSNorm)
block norms:104-107/136, biased q/k/v/o and lm_head:27-30/157, per-expert
w1/w3/w2 keys folded into the SwitchGLU stack (sanitize:166-183),
topk-then-softmax routing:85-93.

TPU design: qwen2_moe scan decoder with the block-norm hook switched to
LayerNorm and the su-scaled rope from core/rope.py (longrope branch).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ...core.layers import layer_norm, linear
from ...core.rope import make_rope
from ..qwen2_moe.config import TextConfig as _MoEText
from ..qwen2_moe.language import MoELanguageModel
from ..qwen2_moe.qwen2_moe import Model as _MoEModel


@dataclass
class TextConfig(_MoEText):
    model_type: str = "phimoe"
    num_local_experts: int = 16
    num_experts_per_tok: int = 2
    norm_topk_prob: bool = True  # softmax over the selected experts
    attention_bias: bool = True
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6
    original_max_position_embeddings: int = 4096

    def __post_init__(self):
        super().__post_init__()
        self.num_experts = self.num_local_experts


ModelConfig = TextConfig


class PhiMoELanguageModel(MoELanguageModel):
    def __init__(self, args: TextConfig, config=None):
        super().__init__(args, config)
        self._norm = layer_norm
        if args.rope_scaling and "short_factor" in args.rope_scaling:
            scaling = dict(args.rope_scaling)
            scaling.setdefault("rope_type", "longrope")
            scaling.setdefault(
                "original_max_position_embeddings",
                args.original_max_position_embeddings,
            )
            self.rope = make_rope(
                self.head_dim, args.rope_theta, scaling,
                args.max_position_embeddings,
            )

    def logits(self, params, hidden):
        return linear(params["lm_head"], hidden)  # biased head


_EXPERT_RE = re.compile(r"\.block_sparse_moe\.experts\.(\d+)\.(w1|w2|w3)\.")
_EXPERT_NAME = {"w1": "gate_proj", "w2": "down_proj", "w3": "up_proj"}


class Model(_MoEModel):
    def __init__(self, config: TextConfig):
        self.config = config
        self.language_model = PhiMoELanguageModel(config)

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
