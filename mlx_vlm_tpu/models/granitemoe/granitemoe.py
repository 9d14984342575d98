"""GraniteMoE text model (IBM Granite 3.x MoE line).

Role parity: reference mlx_vlm/models/granitemoe/language.py — mup-style
multipliers (attention_multiplier as attention scale:26,
residual_multiplier:129, embedding_multiplier:143, logits_scaling:180),
topk-then-softmax router (`router.layer`):71-88, fused per-layer expert
tensors `input_linear` [E, 2I, D] split into gate/up + `output_linear`
(sanitize:183-199).

TPU design: qwen2_moe scan decoder + granite multipliers; sanitize emits
already-[E,...]-stacked expert keys, which the layer stacker lifts to
[L, E, ...] — the same layout per-expert checkpoint keys produce.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..qwen2_moe.config import TextConfig as _MoEText
from ..qwen2_moe.language import MoELanguageModel
from ..qwen2_moe.qwen2_moe import Model as _MoEModel


@dataclass
class TextConfig(_MoEText):
    model_type: str = "granitemoe"
    num_local_experts: int = 8
    num_experts_per_tok: int = 2
    norm_topk_prob: bool = True  # softmax over the selected experts
    attention_bias: bool = False
    rope_theta: float = 10000.0
    embedding_multiplier: float = 1.0
    residual_multiplier: float = 1.0
    logits_scaling: float = 1.0
    attention_multiplier: float = 0.0  # 0 -> default head_dim**-0.5
    tie_word_embeddings: bool = True

    def __post_init__(self):
        super().__post_init__()
        self.num_experts = self.num_local_experts


ModelConfig = TextConfig


class GraniteMoELanguageModel(MoELanguageModel):
    def __init__(self, args: TextConfig, config=None):
        super().__init__(args, config)
        self.residual_scale = args.residual_multiplier
        if args.attention_multiplier:
            self.scale = args.attention_multiplier

    def embed(self, params, input_ids):
        return super().embed(params, input_ids) * self.args.embedding_multiplier

    def logits(self, params, hidden):
        return super().logits(params, hidden) / self.args.logits_scaling


class Model(_MoEModel):
    def __init__(self, config: TextConfig):
        self.config = config
        self.language_model = GraniteMoELanguageModel(config)

    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            if ".block_sparse_moe.input_linear." in k:
                # [E, 2I, D] -> stacked gate/up [E, I, D]
                gate, up = np.split(np.asarray(v), 2, axis=1)
                base = k.replace(".block_sparse_moe.input_linear.",
                                 ".mlp.experts.{}.")
                out["language_model." + base.format("gate_proj")] = gate
                out["language_model." + base.format("up_proj")] = up
                continue
            if ".block_sparse_moe.output_linear." in k:
                k = k.replace(".block_sparse_moe.output_linear.",
                              ".mlp.experts.down_proj.")
            k = k.replace(".block_sparse_moe.router.layer.", ".mlp.gate.")
            if not k.startswith("language_model."):
                k = "language_model." + k
            out[k] = v
        return out
