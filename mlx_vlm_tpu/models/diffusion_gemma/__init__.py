"""DiffusionGemma (Gemma-class diffusion language model).

Role parity: reference mlx_vlm/models/diffusion_gemma — the gemma4-class
hybrid decoder (q/k/v norms with a scaleless v-norm, per-layer-type
head geometry incl. wide global heads, proportional rope on full
layers, GeGLU MoE with router per-expert scales, sandwich norms, final
logit softcap) decoding a DIFFUSION CANVAS: bidirectional attention
within the canvas (sliding layers keep a symmetric local window) and
iterative demasking via the shared diffusion generator (language.py
:176-235, generate/diffusion.py confidence-threshold and entropy-bound
samplers).

TPU design: rides the gemma4_text scanned decoder with its
canvas_bidirectional hook; `forward_full` is one jitted full-canvas
forward (the llada contract `is_diffusion_model` dispatches on).
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass
from typing import List, Optional, Union

import jax.numpy as jnp

from ..gemma4_text.gemma4_text import LanguageModel as _G4LM
from ..gemma4_text.gemma4_text import Model as _G4Model
from ..gemma4_text.gemma4_text import TextConfig as _G4Text


@dataclass
class TextConfig(_G4Text):
    model_type: str = "diffusion_gemma_text"
    mask_token_id: Optional[int] = None
    canvas_length: int = 256
    # diffusion_gemma's reference default is 5 sliding + 1 full per block
    # (config.py layer_types) — gemma4_text expresses that as pattern 6
    sliding_window_pattern: int = 6


@dataclass
class ModelConfig(TextConfig):
    model_type: str = "diffusion_gemma"
    diffusion: bool = True

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        # text fields may nest under text_config
        tc = params.pop("text_config", None)
        if isinstance(tc, dict):
            merged = dict(tc)
            merged.update({k: v for k, v in params.items()
                           if k in cls.__dataclass_fields__})
            params = merged | {k: v for k, v in params.items()
                               if k not in merged}
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


class LanguageModel(_G4LM):
    def __init__(self, args, config=None):
        super().__init__(args, config)
        self.canvas_bidirectional = True


class Model(_G4Model):
    CONFIG_CLS = ModelConfig

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.language_model = LanguageModel(config)

    def forward_full(self, params, input_ids, causal: bool = False):
        """Bidirectional full-canvas forward -> logits [B, S, V]
        (the diffusion generator's contract, models/llada/llada.py:34)."""
        lm = params["language_model"]
        embeds = self.language_model.embed(lm, input_ids)
        B, S = input_ids.shape
        self.language_model.canvas_bidirectional = not causal
        try:
            pos = jnp.broadcast_to(
                jnp.arange(S, dtype=jnp.int32)[None, None], (3, B, S))
            hidden, _ = self.language_model(lm, embeds, None, pos)
        finally:
            self.language_model.canvas_bidirectional = True
        return self.language_model.logits(lm, hidden)


__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel"]
