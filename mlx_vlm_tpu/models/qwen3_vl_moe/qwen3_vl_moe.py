"""Qwen3-VL-MoE: qwen3_vl with a top-k expert MLP in every decoder layer.

Role parity: reference mlx_vlm/models/qwen3_vl_moe/language.py —
Qwen3VLMoESparseMoeBlock:132 (softmax-then-topk routing + SwitchGLU),
sanitize of fused expert tensors:673-681.

TPU design: experts stay fused [L, E, ...] and run through the shared
masked-scan switch_glu (core/moe.py), so the decoder remains a single
lax.scan over layers.  Both HF-fused (`experts.gate_up_proj` [E, D, 2I])
and mlx-fused (`experts.{gate,up,down}_proj` [E, I, D]) checkpoint layouts
are normalized in sanitize.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import List

from ...core.moe import switch_glu, topk_router
from ..qwen3_vl.config import ModelConfig as _VLModelConfig
from ..qwen3_vl.config import TextConfig as _VLTextConfig
from ..qwen3_vl.config import VisionConfig
from ..qwen3_vl.language import LanguageModel as _VLLanguage
from ..qwen3_vl.qwen3_vl import Model as _VLModel


@dataclass
class TextConfig(_VLTextConfig):
    model_type: str = "qwen3_vl_moe_text"
    num_experts: int = 128
    num_experts_per_tok: int = 8
    moe_intermediate_size: int = 768
    norm_topk_prob: bool = True
    decoder_sparse_step: int = 1
    mlp_only_layers: List[int] = field(default_factory=list)

    def __post_init__(self):
        super().__post_init__()
        if self.mlp_only_layers or self.decoder_sparse_step != 1:
            # the scanned decoder needs homogeneous layers; every released
            # qwen3_vl_moe checkpoint is all-MoE (sparse_step=1)
            raise ValueError(
                "qwen3_vl_moe requires every layer to be MoE "
                "(decoder_sparse_step == 1, mlp_only_layers == [])"
            )


@dataclass
class ModelConfig(_VLModelConfig):
    model_type: str = "qwen3_vl_moe"

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {}
        )
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {}
        )
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


class MoELanguageModel(_VLLanguage):
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
        return out.reshape(B, S, D)


class Model(_VLModel):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.language_model = MoELanguageModel(config.text_config, config)

    @staticmethod
    def sanitize(weights: dict) -> dict:
        weights = _VLModel.sanitize(weights)
        out = {}
        for k, v in weights.items():
            if ".mlp.switch_mlp." in k:
                # mlx fused layout — already [E, I, D] / [E, D, I]
                k = k.replace(".switch_mlp.", ".experts.")
                if k.endswith("_proj"):
                    k += ".weight"
                out[k] = v
                continue
            if ".mlp.experts." in k:
                if k.endswith("gate_up_proj"):
                    # HF fused layout [E, D, 2I] -> gate/up [E, I, D]
                    half = v.shape[-1] // 2
                    base = k[: -len("gate_up_proj")]
                    out[base + "gate_proj.weight"] = (
                        v[..., :half].transpose(0, 2, 1)
                    )
                    out[base + "up_proj.weight"] = (
                        v[..., half:].transpose(0, 2, 1)
                    )
                    continue
                if k.endswith("experts.down_proj"):
                    # HF fused layout [E, I, D] -> [E, D, I]
                    out[k + ".weight"] = v.transpose(0, 2, 1)
                    continue
            out[k] = v
        return out
